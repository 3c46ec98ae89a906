#!/usr/bin/env python
"""Benchmark: CPM R-CNN R-50-FPN training throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

North-star (BASELINE.md): COCO images/sec/chip at R-50-FPN with box-mAP
parity. The reference published no throughput numbers (vs_baseline is the
ratio vs the recorded baseline when one exists; null until then).

Runs the flagship CPM config (CMM+ISM+RSM, R-50-FPN) on synthetic batches
at the training resolution (800-shortest-side bucket, 832x1344) — the same
compiled train step used by tools/train_net.py.
"""

import json
import sys
import time


def main():
    import jax

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.engine.train import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from cpm_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = get_default_cfg()
    cfg.MODEL.FPN_ON = True
    cfg.MODEL.FASTER_RCNN = False
    cfg.MODEL.GRID_ON = True
    cfg.MODEL.NUM_CLASSES = 81
    cfg.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 2000
    g = cfg.GRID_RCNN
    g.CASCADE_MAPPING_ON = True
    g.IOU_HELPER = True
    g.IOU_HELPER_MERGE = True
    g.RESCORE_ON = True
    g.FUSED_ON = False

    n_dev = jax.local_device_count()
    per_chip_batch = 2  # reference recipe: global 16 over 8 GPUs
    batch_size = per_chip_batch * n_dev

    height, width = 832, 1344  # 800-shortest-side landscape bucket

    def run(batch_size, height, width, steps=8, warmup=2):
        batch = synthetic_batch(
            batch_size=batch_size, height=height, width=width,
            max_gt=32, num_classes=81, seed=0,
        )
        mesh = make_mesh(n_dev)
        model, tx, state = create_train_state(
            cfg, jax.random.PRNGKey(0), batch
        )
        step_fn = jit_train_step(make_train_step(cfg, model, tx), mesh)
        with mesh:
            sharded = shard_batch(batch, mesh)
            for _ in range(warmup):
                state_new, metrics = step_fn(state, sharded)
                state = state_new
            jax.block_until_ready(metrics)
            t0 = time.time()
            for _ in range(steps):
                state, metrics = step_fn(state, sharded)
            jax.block_until_ready(metrics)
            dt = time.time() - t0
        return batch_size * steps / dt

    try:
        imgs_per_sec = run(batch_size, height, width)
    except Exception as e:  # noqa: BLE001 — OOM fallback to batch 1/chip
        print(f"bench fallback (batch {batch_size} failed: {e})", file=sys.stderr)
        imgs_per_sec = run(n_dev, height, width)

    per_chip = imgs_per_sec / n_dev
    print(
        json.dumps(
            dict(
                metric="cpm_r50_fpn_train_throughput_per_chip",
                value=round(per_chip, 3),
                unit="images/sec/chip",
                vs_baseline=None,
            )
        )
    )


if __name__ == "__main__":
    main()
