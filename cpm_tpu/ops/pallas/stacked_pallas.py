"""Pallas TPU kernel: SWITCH-FREE stacked-levels multilevel RoIAlign.

Ninth-pass reformulation of `multilevel_pallas.multilevel_roi_align_pallas`
(same reference semantics: csrc/ROIAlign/ROIAlign_cuda.cu:14-120 via the
Pooler/LevelMapper of pet/rcnn/utils/poolers.py:9-132). The measured
per-roi forward floor of the windowed kernel (~5 us/roi on v5e,
docs/PROFILE.md eighth pass) is in-kernel serial scalar work, led by the
per-roi `lax.switch` over FPN levels that every window DMA must run
through (each branch carries its own tile-descriptor code). This kernel
removes the switch entirely:

  * XLA-side, all level maps are stacked into ONE HBM buffer
    [B, sum(H_l) + WIN, Wmax, C] at a common padded width (each level's
    rows zero-padded on the right, WIN zero rows appended at the bottom).
    A roi's window row origin becomes `row_offset[level] + y0` — plain
    scalar arithmetic on prefetched scalars, identical for every roi.
  * The kernel body is ONE static tile loop (no per-level branches, no
    small-level scratch zero-fill): rows a window reads past its level's
    end land in the next level's (finite) features or the zero tail, and
    carry bilinear hat weight exactly 0 by the same clamping argument as
    the windowed kernel (samples clamp to the TRUE level dims in
    `_prep_rois`, so cells >= H_l / W_l get weight 0).
  * Backward: read-modify-write gradient accumulation into one stacked
    grad buffer (sequential TPU grid, race-free), sliced back into
    per-level gradients by XLA afterwards.

Numerics are identical to the windowed kernel / the XLA gather path
(same `_prep_rois` coordinate math, same matmul formulation):
tests/test_pallas_multilevel.py parametrizes this backend too.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpm_tpu.ops.pallas.multilevel_pallas import (
    FWD_DEPTH,
    FWD_GROUP,
    FWD_TILE_COLS,
    FWD_TILE_ROWS,
    WIN,
    _hat_weights,
    _prep_rois,
)


def _stack_geometry(level_hw):
    """(row offsets per level, total rows, common padded width)."""
    wmax = max(((w + 7) // 8) * 8 for _, w in level_hw)
    wmax = max(wmax, WIN)  # window cols must fit the buffer
    offs, rows = [], 0
    for h, _ in level_hw:
        offs.append(rows)
        rows += h
    return tuple(offs), rows + WIN, wmax


def _stack_levels(features, wmax):
    """[B, H_l, W_l, C] maps -> one [B, totH, wmax, C] buffer with WIN
    zero rows at the bottom (top-level window overflow reads zeros)."""
    B, C = features[0].shape[0], features[0].shape[-1]
    parts = [
        jnp.pad(f, ((0, 0), (0, 0), (0, wmax - f.shape[2]), (0, 0)))
        for f in features
    ]
    parts.append(jnp.zeros((B, WIN, wmax, C), features[0].dtype))
    return jnp.concatenate(parts, axis=1)


def _fwd_kernel_body(sr, ph, pw, G, D,
                     b_ref, row0_ref, x0_ref, valid_ref,
                     need_r_ref, need_c_ref,
                     ys_ref, xs_ref, feat_ref, out_ref,
                     win_scratch, sem):
    i = pl.program_id(0)
    NSTEP = pl.num_programs(0)
    slot = jax.lax.rem(i, D)
    C = win_scratch.shape[-1]
    sy, sx = ph * sr, pw * sr

    tiles = []
    for s in range(0, WIN, FWD_TILE_ROWS):
        rows = min(FWD_TILE_ROWS, WIN - s)
        for c in range(0, WIN, FWD_TILE_COLS):
            tiles.append((s, rows, c, min(FWD_TILE_COLS, WIN - c)))

    def for_window(j, sl, g, start):
        """Issue (start=True) or await the guarded tile DMAs of roi j —
        one flat tile loop, no level dispatch."""
        need_rows = need_r_ref[j]
        need_cols = need_c_ref[j]
        # x origins are floor-aligned to 8 in _prep_rois; Mosaic needs
        # the hint to prove the DMA slice offset is tile-aligned
        x0 = pl.multiple_of(x0_ref[j], 8)
        for s, rows, c, cols in tiles:

            @pl.when((s < need_rows) & (c < need_cols))
            def _tile(s=s, rows=rows, c=c, cols=cols):
                d = pltpu.make_async_copy(
                    feat_ref.at[
                        b_ref[j], pl.ds(row0_ref[j] + s, rows),
                        pl.ds(x0 + c, cols), :
                    ],
                    win_scratch.at[sl, g, pl.ds(s, rows), pl.ds(c, cols), :],
                    sem.at[sl, g],
                )
                if start:
                    d.start()
                else:
                    d.wait()

    def start_group(s, sl):
        for g in range(G):

            @pl.when(valid_ref[s * G + g] != 0)
            def _start(g=g):
                for_window(s * G + g, sl, g, start=True)

    # scratch VMEM is UNDEFINED at kernel start (NaN bit patterns
    # possible on hardware): zero it once so tiles the support skip
    # never DMAs stay finite under their zero hat weights. After that,
    # stale regions hold a previous roi's finite features — also safe.
    @pl.when(i == 0)
    def _first():
        win_scratch[:] = jnp.zeros_like(win_scratch)
        for s in range(min(D - 1, NSTEP)):
            start_group(s, s)

    @pl.when(i + (D - 1) < NSTEP)
    def _prefetch():
        start_group(i + (D - 1), jax.lax.rem(i + (D - 1), D))

    for g in range(G):
        j = i * G + g

        @pl.when(valid_ref[j] == 0)
        def _zero(g=g):
            out_ref[g] = jnp.zeros_like(out_ref[g])

        @pl.when(valid_ref[j] != 0)
        def _compute(j=j, g=g):
            for_window(j, slot, g, start=False)

            fd = win_scratch.dtype
            # f32 features: HIGHEST precision so the MXU does not
            # truncate the multiplicands to bf16 (see the windowed
            # kernel); bf16 keeps the native path
            prec = (jax.lax.Precision.HIGHEST
                    if fd == jnp.float32 else None)
            wy = _hat_weights(ys_ref[j], WIN).astype(fd)  # [Sy, WIN]
            wx = _hat_weights(xs_ref[j], WIN).astype(fd)  # [Sx, WIN]
            win = win_scratch[slot, g]  # [WIN, WIN, C]
            t = jnp.dot(
                wy, win.reshape(WIN, WIN * C),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(sy, WIN, C)
            # (explicit transpose: Mosaic's supported layout — see the
            # windowed kernel for the failed alternatives)
            t = jnp.dot(
                wx.astype(jnp.float32),
                t.transpose(1, 0, 2).reshape(WIN, sy * C),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(sx, sy, C)
            vals = t.transpose(1, 0, 2)  # [Sy, Sx, C]
            pooled = vals.reshape(ph, sr, pw, sr, C).mean(axis=(1, 3))
            out_ref[g] = pooled.astype(out_ref.dtype)


def _bwd_kernel_body(sr, ph, pw,
                     b_ref, row0_ref, x0_ref, valid_ref,
                     need_r_ref, need_c_ref,
                     ys_ref, xs_ref, g_ref, _zin_ref, grad_ref,
                     win_scratch, sem):
    i = pl.program_id(0)
    b = b_ref[i]
    row0 = row0_ref[i]
    x0 = pl.multiple_of(x0_ref[i], 8)
    C = win_scratch.shape[-1]
    sy, sx = ph * sr, pw * sr

    need_rows = need_r_ref[i]
    need_cols = need_c_ref[i]

    wy = _hat_weights(ys_ref[i], WIN)  # [Sy, WIN]
    wx = _hat_weights(xs_ref[i], WIN)
    prec = (jax.lax.Precision.HIGHEST
            if g_ref.dtype == jnp.float32 else None)
    g = g_ref[0].astype(jnp.float32) / float(sr * sr)  # [ph, pw, C]
    g = jnp.broadcast_to(
        g[:, None, :, None, :], (ph, sr, pw, sr, C)
    ).reshape(sy, sx, C)
    bx = jnp.dot(
        wx.T, g.transpose(1, 0, 2).reshape(sx, sy * C),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(WIN, sy, C)
    b2 = bx.transpose(1, 0, 2).reshape(sy, WIN * C)

    slab = win_scratch.shape[0]

    @pl.when(valid_ref[i] != 0)
    def _accumulate():
        # y-slab read-modify-write, race-free on the sequential grid;
        # slabs/cols beyond the hat support carry zero gradient and skip
        ys0 = 0
        while ys0 < WIN:
            rows = min(slab, WIN - ys0)

            @pl.when(ys0 < need_rows)
            def _rmw(ys0=ys0, rows=rows):
                gw_slab = jnp.dot(
                    wy[:, ys0:ys0 + rows].T, b2,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ).reshape(rows, WIN, C)
                for c in range(0, WIN, 32):
                    cols = min(32, WIN - c)

                    @pl.when(c < need_cols)
                    def _half(c=c, cols=cols):
                        dma_in = pltpu.make_async_copy(
                            grad_ref.at[
                                b, pl.ds(row0 + ys0, rows),
                                pl.ds(x0 + c, cols), :
                            ],
                            win_scratch.at[
                                pl.ds(0, rows), pl.ds(c, cols), :
                            ],
                            sem,
                        )
                        dma_in.start()
                        dma_in.wait()
                        win_scratch[
                            pl.ds(0, rows), pl.ds(c, cols), :
                        ] = (
                            win_scratch[pl.ds(0, rows), pl.ds(c, cols), :]
                            + gw_slab[:, c:c + cols].astype(
                                win_scratch.dtype
                            )
                        )
                        dma_out = pltpu.make_async_copy(
                            win_scratch.at[
                                pl.ds(0, rows), pl.ds(c, cols), :
                            ],
                            grad_ref.at[
                                b, pl.ds(row0 + ys0, rows),
                                pl.ds(x0 + c, cols), :
                            ],
                            sem,
                        )
                        dma_out.start()
                        dma_out.wait()

            ys0 += rows


def _unpack_rois_levels(rois_levels):
    if len(rois_levels) == 3:
        rois, levels, valid = rois_levels
        valid = valid.astype(jnp.int32)
    else:
        rois, levels = rois_levels
        valid = jnp.ones(rois.shape[:1], jnp.int32)
    return rois, levels, valid


def _common_prep(features, rois_levels, output_size, spatial_scales,
                 sampling_ratio, aligned):
    rois, levels, valid = _unpack_rois_levels(rois_levels)
    features = tuple(features)
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    level_hw = tuple((int(f.shape[1]), int(f.shape[2])) for f in features)
    level_hw_pad = tuple((h, ((w + 7) // 8) * 8) for h, w in level_hw)
    offs, tot_rows, wmax = _stack_geometry(level_hw)

    batch, y0, x0, ys_rel, xs_rel, need_r, need_c = _prep_rois(
        rois, levels, spatial_scales, level_hw, level_hw_pad,
        output_size, sr, aligned,
    )
    row0 = jnp.asarray(np.asarray(offs, np.int32))[
        levels.astype(jnp.int32)
    ] + y0
    return (features, rois, levels, valid, ph, pw, sr, level_hw,
            offs, tot_rows, wmax, batch, row0, x0, ys_rel, xs_rel,
            need_r, need_c)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def multilevel_roi_align_stacked(
    features,
    rois_levels,
    output_size,
    spatial_scales,
    sampling_ratio=0,
    aligned=False,
    interpret=False,
):
    """Switch-free stacked-levels Pallas multilevel RoIAlign.

    Same contract as `multilevel_roi_align_pallas`:
      features: tuple of [B, Hl, Wl, C] NHWC maps (finest first).
      rois_levels: (rois [R, 5], levels [R] int32[, valid [R]]).
    Returns: [R, ph, pw, C] in the feature dtype.
    """
    out, _ = _fwd(features, rois_levels, output_size, spatial_scales,
                  sampling_ratio, aligned, interpret)
    return out


def _fwd(features, rois_levels, output_size, spatial_scales,
         sampling_ratio, aligned, interpret):
    (features, rois, levels, valid, ph, pw, sr, level_hw,
     offs, tot_rows, wmax, batch, row0, x0, ys_rel, xs_rel,
     need_r, need_c) = _common_prep(
        features, rois_levels, output_size, spatial_scales,
        sampling_ratio, aligned,
    )
    C = features[0].shape[-1]
    R = rois.shape[0]
    stacked = _stack_levels(features, wmax)

    G = FWD_GROUP
    win_bytes = WIN * WIN * C * jnp.dtype(features[0].dtype).itemsize * G
    FWD_D = max(2, min(FWD_DEPTH, (8 << 20) // max(1, win_bytes)))
    R_pad = -(-R // G) * G
    if R_pad != R:
        pad = R_pad - R
        batch = jnp.pad(batch, (0, pad))
        row0 = jnp.pad(row0, (0, pad))
        x0 = jnp.pad(x0, (0, pad))
        need_r = jnp.pad(need_r, (0, pad))
        need_c = jnp.pad(need_c, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        ys_rel = jnp.pad(ys_rel, ((0, pad), (0, 0)))
        xs_rel = jnp.pad(xs_rel, ((0, pad), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,  # batch, row0, x0, valid, need_r/c
        grid=(R_pad // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ys_rel [R, Sy]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xs_rel [R, Sx]
            pl.BlockSpec(memory_space=pl.ANY),      # stacked features
        ],
        out_specs=pl.BlockSpec(
            (G, ph, pw, C), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((FWD_D, G, WIN, WIN, C), features[0].dtype),
            pltpu.SemaphoreType.DMA((FWD_D, G)),
        ],
    )
    kernel = partial(_fwd_kernel_body, sr, ph, pw, G, FWD_D)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (R_pad, ph, pw, C), features[0].dtype
        ),
        interpret=interpret,
    )(
        batch, row0, x0, valid, need_r, need_c,
        ys_rel, xs_rel, stacked,
    )
    if R_pad != R:
        out = out[:R]
    residuals = (features, rois_levels)
    return out, residuals


def _bwd(output_size, spatial_scales, sampling_ratio, aligned, interpret,
         residuals, g):
    features, rois_levels = residuals
    (features, rois, levels, valid, ph, pw, sr, level_hw,
     offs, tot_rows, wmax, batch, row0, x0, ys_rel, xs_rel,
     need_r, need_c) = _common_prep(
        features, rois_levels, output_size, spatial_scales,
        sampling_ratio, aligned,
    )
    C = features[0].shape[-1]
    R = rois.shape[0]
    B = features[0].shape[0]

    # grads accumulate in the FEATURE dtype into ONE stacked buffer
    # (matching the windowed kernel's bf16 accumulation), sliced back
    # into per-level gradients by XLA after the kernel
    acc_dtype = features[0].dtype
    slab_rows = 32 if acc_dtype == jnp.bfloat16 else 16
    zeros = jnp.zeros((B, tot_rows, wmax, C), acc_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ys_rel [R, Sy]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xs_rel [R, Sx]
            pl.BlockSpec(
                (1, ph, pw, C), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # grad out
            pl.BlockSpec(memory_space=pl.ANY),      # aliased zeros input
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, WIN, C), acc_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = partial(_bwd_kernel_body, sr, ph, pw)
    stacked_grad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, tot_rows, wmax, C), acc_dtype),
        input_output_aliases={
            # the zeros input aliases the grad output for in-place
            # accumulation: 6 prefetch + ys + xs + g = 9 args before it
            9: 0
        },
        interpret=interpret,
    )(
        batch, row0, x0, valid, need_r, need_c,
        ys_rel, xs_rel, g, zeros,
    )
    grads = tuple(
        stacked_grad[:, off:off + f.shape[1], : f.shape[2], :].astype(
            f.dtype
        )
        for off, f in zip(offs, features)
    )
    return grads, None  # no grad wrt (rois, levels)


multilevel_roi_align_stacked.defvjp(_fwd, _bwd)
