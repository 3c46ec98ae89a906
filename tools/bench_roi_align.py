#!/usr/bin/env python
"""Microbenchmark: XLA gather vs Pallas windowed multilevel RoIAlign.

Run on real TPU hardware. Shapes mirror the CPM hot path: 4 FPN levels at
the 832x1344 training bucket, 256 channels, 768 rois, 14x14 pool, sr=2.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=768)
    ap.add_argument("--pool", type=int, default=14)
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--valid-frac", type=float, default=1.0,
        help="fraction of rois marked valid (padding-skip cost probe; "
        "the cls/rescore train sites run 1024 slots at ~5%% valid on "
        "realistic data)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from cpm_tpu.ops.pallas.multilevel_pallas import (
        multilevel_roi_align_pallas,
        pallas_supported,
    )
    from cpm_tpu.ops.pallas.stacked_pallas import (
        multilevel_roi_align_stacked,
    )
    from cpm_tpu.ops.roi_align import multilevel_roi_align

    B, C = 2, args.channels
    shapes = [(208, 336), (104, 168), (52, 84), (26, 42)]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    pool = (args.pool, args.pool)
    assert pallas_supported(shapes, pool, 2)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.rand(B, h, w, C), dt) for h, w in shapes
    )
    R = args.rois
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = rng.randint(0, B, R)
    # realistic proposal shapes: areas across all FPN levels, aspect <= 4
    area = np.exp(rng.uniform(np.log(16.0**2), np.log(600.0**2), R))
    aspect = np.exp(rng.uniform(np.log(0.25), np.log(4.0), R))
    w = np.sqrt(area * aspect)
    h = np.sqrt(area / aspect)
    rois[:, 1] = rng.rand(R) * (1344 - w)
    rois[:, 2] = rng.rand(R) * (832 - h)
    rois[:, 3] = rois[:, 1] + w
    rois[:, 4] = rois[:, 2] + h
    rois = jnp.asarray(rois)
    # levels from the real LevelMapper: the windowed kernel's contract is
    # that a roi's extent at its ASSIGNED level fits the static window
    from cpm_tpu.ops.pooler import assign_fpn_levels

    levels = assign_fpn_levels(rois[:, 1:5], 2, 5) - 2
    n_valid = max(1, int(round(R * args.valid_frac)))
    valid = jnp.asarray(np.arange(R) < n_valid)
    if args.valid_frac < 1.0:
        print(f"# valid rois: {n_valid}/{R}")

    def bench(name, fn, grad=False):
        if grad:
            # reduce grads to ONE device scalar: reading a full gradient
            # tensor back over the tunnel would dominate the measurement
            def scalar(fs):
                g = jax.grad(
                    lambda q: jnp.sum(fn(q).astype(jnp.float32) ** 2)
                )(fs)
                return sum(
                    jnp.sum(jnp.abs(x).astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(g)
                )

            f = jax.jit(scalar)
        else:
            f = jax.jit(lambda fs: jnp.sum(fn(fs).astype(jnp.float32)))
        float(f(feats))  # compile + warm
        t0 = time.time()
        iters = 30
        # async dispatch: queue all executions, block once at the end —
        # a per-iteration readout would add a full host<->device tunnel
        # round-trip (~20 ms here) to every sample and swamp small deltas
        outs = [f(feats) for _ in range(iters)]
        float(outs[-1])
        dt_ms = (time.time() - t0) / iters * 1e3
        print(f"{name:34s} {dt_ms:8.2f} ms")
        return dt_ms

    gather_fn = lambda fs: multilevel_roi_align(  # noqa: E731
        list(fs), rois, levels, pool, scales, 2
    )
    pallas_fn = lambda fs: multilevel_roi_align_pallas(  # noqa: E731
        tuple(fs), (rois, levels, valid), pool, scales, 2, False, False
    )

    stacked_fn = lambda fs: multilevel_roi_align_stacked(  # noqa: E731
        tuple(fs), (rois, levels, valid), pool, scales, 2, False, False
    )

    from cpm_tpu.ops.pallas.clustered_pallas import (
        multilevel_roi_align_clustered,
    )

    clustered_fn = lambda fs: multilevel_roi_align_clustered(  # noqa: E731
        tuple(fs), (rois, levels, valid), pool, scales, 2, False, False
    )

    g_f = bench("xla gather fwd", gather_fn)
    p_f = bench("pallas windowed fwd", pallas_fn)
    s_f = bench("pallas stacked fwd", stacked_fn)
    c_f = bench("pallas clustered fwd", clustered_fn)
    g_b = bench("xla gather fwd+bwd", gather_fn, grad=True)
    p_b = bench("pallas windowed fwd+bwd", pallas_fn, grad=True)
    s_b = bench("pallas stacked fwd+bwd", stacked_fn, grad=True)
    c_b = bench("pallas clustered fwd+bwd", clustered_fn, grad=True)
    print(f"speedup: fwd {g_f / p_f:.2f}x   fwd+bwd {g_b / p_b:.2f}x")
    print(
        f"stacked vs windowed: fwd {p_f / s_f:.2f}x   "
        f"fwd+bwd {p_b / s_b:.2f}x"
    )
    print(
        f"clustered vs windowed: fwd {p_f / c_f:.2f}x   "
        f"fwd+bwd {p_b / c_b:.2f}x"
    )
    err_pc = np.max(np.abs(np.asarray(
        multilevel_roi_align_pallas(
            feats, (rois, levels, valid), pool, scales, 2, False, False
        ), np.float32,
    ) - np.asarray(clustered_fn(feats), np.float32)))
    print(f"max |windowed - clustered| on device: {err_pc:.2e}")
    err_ps = np.max(np.abs(np.asarray(
        multilevel_roi_align_pallas(
            feats, (rois, levels, valid), pool, scales, 2, False, False
        ), np.float32,
    ) - np.asarray(stacked_fn(feats), np.float32)))
    print(f"max |windowed - stacked| on device: {err_ps:.2e}")

    # numerics on hardware
    a = np.asarray(
        multilevel_roi_align(list(feats), rois, levels, pool, scales, 2),
        np.float32,
    )
    b = np.asarray(
        multilevel_roi_align_pallas(
            feats, (rois, levels), pool, scales, 2, False, False
        ),
        np.float32,
    )
    err = np.max(np.abs(a - b))
    print(f"max |gather - pallas| on device: {err:.2e}")


if __name__ == "__main__":
    main()
