"""Capture a jax.profiler trace of the train step at a chosen gt density.

Same timing loop as tools/bench_train_only.py, wrapped in
jax.profiler.start_trace/stop_trace. Use tools/trace_report.py on the
resulting xplane protobuf to attribute device time by HLO category.

    python tools/trace_train_step.py --gt 6 --out /tmp/trace_rt
    python tools/trace_report.py /tmp/trace_rt
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", type=int, default=None)
    ap.add_argument("--out", default="/tmp/trace_rt")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("opts", nargs="*")
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

    cfg = _flagship_cfg(tiny=False)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 2000
    if args.opts:
        merge_cfg_from_list(args.opts, cfg)

    n_dev = jax.local_device_count()
    batch = synthetic_batch(
        batch_size=2 * n_dev, height=832, width=1344,
        max_gt=32, num_classes=81, seed=0,
    )
    if args.gt is not None:
        gm = np.array(batch["gt_mask"])
        gm[:, args.gt:] = False
        batch = dict(batch, gt_mask=gm)

    mesh = make_mesh(n_dev)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = jit_train_step(make_train_step(cfg, model, tx), mesh)
    with mesh:
        sharded = shard_batch(batch, mesh)
        for _ in range(3):
            state, metrics = step_fn(state, sharded)
            float(metrics["total_loss"])  # readout barrier
        jax.profiler.start_trace(args.out)
        t0 = time.time()
        for _ in range(args.steps):
            state, metrics = step_fn(state, sharded)
        float(metrics["total_loss"])
        dt = time.time() - t0
        jax.profiler.stop_trace()
    print(f"{args.steps} steps in {dt:.3f}s "
          f"({dt / args.steps * 1e3:.1f} ms/step) -> {args.out}")


if __name__ == "__main__":
    main()
