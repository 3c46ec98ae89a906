"""Quick A/B: train-step ms only (bench.py's timing loop, nothing else).

Prints ms/step over 3 runs of 8 chained steps (min reported) — for
comparing kernel variants without the full bench's eval/host phases.

Trailing `KEY VALUE` pairs override the flagship config, e.g.
    python tools/bench_train_only.py TPU.TILED_TOWERS True
    python tools/bench_train_only.py TPU.POOLER_KERNEL gather
Optional `--gt N` caps the valid gt per image (realistic-density point).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", type=int, default=None,
                    help="cap valid gt per image (realistic density ~6)")
    ap.add_argument("--batch", type=int, default=2,
                    help="images per chip (default 2 = reference recipe)")
    ap.add_argument("--cfg", default=None,
                    help="start from this YAML (e.g. an R-101 / X-101-DCN "
                    "backbone cfg) instead of the flagship R-50 config")
    ap.add_argument("opts", nargs="*", help="cfg KEY VALUE overrides")
    args = ap.parse_args()

    import jax

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _flagship_cfg
    from cpm_tpu.config import merge_cfg_from_list
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.engine.train import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from cpm_tpu.parallel.mesh import make_mesh, shard_batch

    if args.cfg:
        from cpm_tpu.config import get_default_cfg, merge_cfg_from_file

        cfg = get_default_cfg()
        merge_cfg_from_file(args.cfg, cfg)
        print(f"# cfg: {args.cfg}")
    else:
        cfg = _flagship_cfg(tiny=False)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 2000
    if args.opts:
        merge_cfg_from_list(args.opts, cfg)
        print(f"# overrides: {args.opts}")
    if args.cfg:
        from cpm_tpu.config import assert_and_infer_cfg

        assert_and_infer_cfg(cfg, make_immutable=False)

    n_dev = jax.local_device_count()
    batch = synthetic_batch(
        batch_size=args.batch * n_dev, height=832, width=1344,
        max_gt=32, num_classes=81, seed=0,
    )
    if args.gt is not None:
        gm = np.array(batch["gt_mask"])
        gm[:, args.gt:] = False
        batch = dict(batch, gt_mask=gm)
        print(f"# gt capped to {args.gt}/image")
    mesh = make_mesh(n_dev)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = jit_train_step(make_train_step(cfg, model, tx), mesh)
    steps = 8
    with mesh:
        sharded = shard_batch(batch, mesh)
        for _ in range(3):
            state, metrics = step_fn(state, sharded)
            float(metrics["total_loss"])  # readout barrier (see bench.py)
        times = []
        for run in range(3):
            t0 = time.time()
            for _ in range(steps):
                state, metrics = step_fn(state, sharded)
            final = float(metrics["total_loss"])
            times.append((time.time() - t0) / steps * 1e3)
            assert np.isfinite(final), final
        print(f"ms/step over 3 runs: {[f'{t:.1f}' for t in times]} "
              f"min {min(times):.1f} "
              f"({args.batch / (min(times) / 1e3):.2f} img/s/chip)")


if __name__ == "__main__":
    main()
