#!/usr/bin/env python
"""Tenth-pass probe: cross-roi shared-window batched contraction.

PROFILE.md's eighth/ninth passes pinned the pooler's ~5 us/roi forward
floor on the within-roi serial chain — hat build, two skinny matmuls at
~11% MXU occupancy (14-row operands), transpose, writeback. The one
formulation left unexplored is batching the contractions ACROSS rois
that share a window (spatial clustering).

This probe measures that formulation's UPPER BOUND: a kernel where each
grid step processes G rois that are ASSUMED to share one window — one
window DMA per G rois, first contraction batched as [G*Sy, WIN] @
[WIN, WIN*C] (G*14 = 112 rows at G=8: near-full MXU occupancy instead
of 14). Numerics are intentionally wrong for G>1 (every roi in a group
reads the group leader's window); the timing is the ideal-case bound
with ZERO clustering overhead, ZERO extra DMA bytes (union windows),
and ZERO output scatter cost. G=1 in the same harness is the baseline.

If even this bound is not decisively faster than the production
windowed kernel, the real formulation (which must pay for sorting,
union windows, and scatter) cannot win, and the pooler story is
measured-complete.

Run on the real chip: python tools/probe_pooler_crossroi.py
"""

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def make_probe(G, ph, pw, sr, C, HW, feat_dtype):
    """Build the G-rois-per-window probe pallas_call (single level)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cpm_tpu.ops.pallas.multilevel_pallas import WIN, _hat_weights

    Sy, Sx = ph * sr, pw * sr

    def body(b_ref, y0_ref, x0_ref, ys_ref, xs_ref, feat_ref, out_ref,
             win_scratch, sem):
        i = pl.program_id(0)
        NSTEP = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)

        def dma(step, sl):
            # group leader's window; one 64x64xC descriptor
            x0 = pl.multiple_of(x0_ref[step], 8)
            return pltpu.make_async_copy(
                feat_ref.at[
                    b_ref[step], pl.ds(y0_ref[step], WIN),
                    pl.ds(x0, WIN), :
                ],
                win_scratch.at[sl],
                sem.at[sl],
            )

        @pl.when(i == 0)
        def _first():
            dma(0, 0).start()

        @pl.when(i + 1 < NSTEP)
        def _prefetch():
            dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        dma(i, slot).wait()
        fd = win_scratch.dtype
        win = win_scratch[slot]  # [WIN, WIN, C]

        # stacked hats: [G*Sy, WIN]. Built per-g then concatenated —
        # _hat_weights on a reshaped (G*Sy,) block row crashes the
        # Mosaic compiler (tpu_compile_helper exit 1) at G >= 2, while
        # per-g [Sy, WIN] hats (the production shape) + concatenate
        # compile at every G
        wy = jnp.concatenate(
            [_hat_weights(ys_ref[0, g], WIN) for g in range(G)], axis=0
        ).astype(fd)
        # ONE batched first contraction: [G*Sy, WIN] @ [WIN, WIN*C]
        t = jnp.dot(
            wy, win.reshape(WIN, WIN * C),
            preferred_element_type=jnp.float32,
        ).reshape(G * Sy, WIN, C)
        for g in range(G):
            wx = _hat_weights(xs_ref[0, g], WIN)  # [Sx, WIN] f32
            tg = t[g * Sy : (g + 1) * Sy]  # static major-dim row slice
            tg = jnp.dot(
                wx,
                tg.transpose(1, 0, 2).reshape(WIN, Sy * C),
                preferred_element_type=jnp.float32,
            ).reshape(Sx, Sy, C)
            vals = tg.transpose(1, 0, 2)
            pooled = vals.reshape(ph, sr, pw, sr, C).mean(axis=(1, 3))
            out_ref[g] = pooled.astype(out_ref.dtype)

    def run(feat, b, y0, x0, ys, xs, R):
        n_groups = R // G
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # b, y0, x0 (per group)
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec(
                    (1, G, Sy), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G, Sx), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (G, ph, pw, C), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, WIN, WIN, C), feat_dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, ph, pw, C), feat_dtype),
        )(b, y0, x0, ys.reshape(n_groups, G, Sy),
          xs.reshape(n_groups, G, Sx), feat)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=1024)
    ap.add_argument("--pool", type=int, default=7)
    ap.add_argument("--channels", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from cpm_tpu.ops.pallas.multilevel_pallas import (
        WIN,
        multilevel_roi_align_pallas,
        _prep_rois,
    )

    B, C = 2, args.channels
    H, W = 208, 336  # P2-sized single level
    ph = pw = args.pool
    sr = 2
    R = args.rois
    dt = jnp.bfloat16

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(B, H, W, C), dt)

    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = rng.randint(0, B, R)
    area = np.exp(rng.uniform(np.log(56.0**2), np.log(110.0**2), R))
    aspect = np.exp(rng.uniform(np.log(0.5), np.log(2.0), R))
    w = np.sqrt(area * aspect)
    h = np.sqrt(area / aspect)
    rois[:, 1] = rng.rand(R) * (1344 - w)
    rois[:, 2] = rng.rand(R) * (832 - h)
    rois[:, 3] = rois[:, 1] + w
    rois[:, 4] = rois[:, 2] + h
    rois_j = jnp.asarray(rois)
    levels = jnp.zeros(R, jnp.int32)

    level_hw = ((H, W),)
    b, y0, x0, ys, xs, _, _ = _prep_rois(
        rois_j, levels, (0.25,), level_hw, level_hw, (ph, pw), sr, False,
    )

    def bench(name, f, *a):
        out = jax.jit(lambda *q: jnp.sum(f(*q).astype(jnp.float32)))
        float(out(*a))
        t0 = time.time()
        iters = 30
        rs = [out(*a) for _ in range(iters)]
        float(rs[-1])
        dt_ms = (time.time() - t0) / iters * 1e3
        print(f"{name:44s} {dt_ms:8.2f} ms   "
              f"({dt_ms / R * 1e3:.2f} us/roi)")
        return dt_ms

    # production kernel reference point (same shapes, single level)
    prod = partial(
        multilevel_roi_align_pallas,
        (feat,),
        output_size=(ph, pw), spatial_scales=(0.25,), sampling_ratio=sr,
    )
    t_prod = bench(
        "production windowed kernel", lambda fz: multilevel_roi_align_pallas(
            (fz,), (rois_j, levels), (ph, pw), (0.25,), sr, False, False
        ), feat,
    )

    results = {}
    for G in (1, 2, 4, 8):
        probe = make_probe(G, ph, pw, sr, C, (H, W), dt)
        try:
            t_g = bench(
                f"shared-window probe G={G}",
                lambda fz, probe=probe: probe(fz, b, y0, x0, ys, xs, R),
                feat,
            )
            results[G] = t_g
        except Exception as e:
            print(f"G={G} failed: {type(e).__name__}: {str(e)[:200]}")

    if 1 in results:
        for G, t_g in results.items():
            print(f"G={G}: {results[1] / t_g:.2f}x vs G=1, "
                  f"{t_prod / t_g:.2f}x vs production")


if __name__ == "__main__":
    main()
