"""Backbone operating-point matrix -> BENCH_backbones.json (driver-visible).

Measures train-step time for the CPM backbone configs (R-50 flagship,
R-101, X-101-32x4d-DCN) on the local chip(s) with the same timing
discipline as bench.py (AOT compile, chained steps, one readout), plus a
per-config GPU-baseline anchor derived from the R-50 anchor:

    baseline_ips(cfg) = 1.75 img/s/GPU * flops(R-50) / flops(cfg)

1.75 img/s/GPU is the reference-recipe R-50 estimate (BASELINE.md /
bench.py); scaling it by the XLA cost-analysis FLOPs ratio assumes the
8x TITAN RTX run is FLOPs-bound across backbones. That understates the
GPU cost of the DCN configs (deformable im2col is gather-bound on GPU
too, deform_conv_cuda_kernel.cu:215-950), so the X-101-DCN anchor is an
UPPER bound on the baseline (a conservative vs_baseline for us).

Usage: python tools/bench_backbones.py [--configs r50 r101 x101dcn]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASELINE_R50_IPS = 1.75

CFG_DIR = "cfgs/rcnn/mscoco/grid_cascade/iou_helper/rescore/backbone"
CONFIGS = {
    "r50": dict(label="R-50-FPN", yaml=None),  # flagship cfg (bench.py)
    "r101": dict(
        label="R-101-FPN",
        yaml=f"{CFG_DIR}/e2e_grid_cascade@567_rcnn_R-101-FPN_2x.yaml",
    ),
    "x101dcn": dict(
        label="X-101-32x4d-FPN-DCN",
        yaml=f"{CFG_DIR}/e2e_grid_cascade@567_rcnn_X-101-32x4d-FPN-DCN_2x.yaml",
        # The grouped deform conv2 executes through a block-diagonal
        # dense contraction (ops/deform_conv.py; the zero blocks are
        # FLOPs the MXU has to spare), so cost_analysis overcounts vs
        # the reference's true grouped math. The baseline anchor uses
        # the TRUE grouped FLOPs, measured from this round's per-group
        # batched-GEMM lowering of the same step (9.584e12; see
        # docs/PROFILE.md twelfth pass) — otherwise vs_baseline would
        # be flattered by our own padding.
        true_flops=9.584450207744e12,
    ),
}


def bench_config(name, meta, batch_per_chip=2):
    import jax

    from __graft_entry__ import _flagship_cfg
    from cpm_tpu.config import (
        assert_and_infer_cfg,
        get_default_cfg,
        merge_cfg_from_file,
    )
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.engine.train import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from cpm_tpu.parallel.mesh import make_mesh, shard_batch

    if meta["yaml"]:
        cfg = get_default_cfg()
        merge_cfg_from_file(meta["yaml"], cfg)
        assert_and_infer_cfg(cfg, make_immutable=False)
    else:
        cfg = _flagship_cfg(tiny=False)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 2000
    # random-init training at the recipe LR diverges without pretrained
    # weights; throughput is LR-invariant (PROFILE backbone matrix)
    cfg.SOLVER.BASE_LR = 1e-6

    n_dev = jax.local_device_count()
    batch = synthetic_batch(
        batch_size=batch_per_chip * n_dev, height=832, width=1344,
        max_gt=32, num_classes=81, seed=0,
    )
    gm = np.array(batch["gt_mask"])
    gm[:, 6:] = False  # realistic density (bench.py headline point)
    batch = dict(batch, gt_mask=gm)

    mesh = make_mesh(n_dev)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = jit_train_step(make_train_step(cfg, model, tx), mesh)
    with mesh:
        sharded = shard_batch(batch, mesh)
        t0 = time.time()
        compiled = step_fn.lower(state, sharded).compile()
        print(f"# {name}: compiled in {time.time() - t0:.0f}s", flush=True)
        flops = None
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        for _ in range(2):
            state, metrics = compiled(state, sharded)
            float(metrics["total_loss"])
        times = []
        steps = 8
        for _ in range(3):
            t0 = time.time()
            for _ in range(steps):
                state, metrics = compiled(state, sharded)
            final = float(metrics["total_loss"])
            times.append((time.time() - t0) / steps * 1e3)
            assert np.isfinite(final), final
    ms = min(times)
    return dict(
        label=meta["label"],
        ms_per_step=round(ms, 1),
        images_per_sec_per_chip=round(batch_per_chip / (ms / 1e3), 3),
        flops_per_step=flops,
        runs_ms=[round(t, 1) for t in times],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS),
                    choices=list(CONFIGS))
    ap.add_argument("--out", default="BENCH_backbones.json")
    args = ap.parse_args()

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    out = dict(
        device_kind=jax.devices()[0].device_kind,
        batch_per_chip=2,
        resolution="832x1344 (800-shortest bucket), gt capped to 6",
        baseline_method=(
            f"R-50 anchor {BASELINE_R50_IPS} img/s/GPU (BASELINE.md), "
            "scaled by XLA cost-analysis FLOPs ratio; UPPER bound for "
            "DCN configs (GPU deform is gather-bound too)"
        ),
        configs={},
    )
    for name in args.configs:
        out["configs"][name] = bench_config(name, CONFIGS[name])
        print(json.dumps({name: out["configs"][name]}), flush=True)

    r50 = out["configs"].get("r50")
    if r50 and r50.get("flops_per_step"):
        for name, rec in out["configs"].items():
            if rec.get("flops_per_step"):
                true_flops = CONFIGS[name].get(
                    "true_flops", rec["flops_per_step"]
                )
                rec["anchor_flops_per_step"] = true_flops
                anchor = (
                    BASELINE_R50_IPS
                    * r50["flops_per_step"] / true_flops
                )
                rec["baseline_ips_per_gpu_est"] = round(anchor, 3)
                rec["vs_baseline"] = round(
                    rec["images_per_sec_per_chip"] / anchor, 3
                )
    out["_measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
