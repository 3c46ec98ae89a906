"""Pallas TPU kernel: windowed multilevel RoIAlign (forward + backward).

Replaces the gather formulation of `cpm_tpu.ops.roi_align.multilevel_roi_align`
on the hot path (reference CUDA kernel: csrc/ROIAlign/ROIAlign_cuda.cu:14-120,
backward :259). TPU-native design:

  * FPN level assignment bounds every roi's feature-space extent: a roi
    assigned level k spans ~[14, 28) cells at that level (LevelMapper rule),
    and level-clamped giant rois live on P5 whose whole map is <= ~26x42
    for <=1536 px images. So ONE static window (WIN x WIN cells, whole-map
    when the level is smaller) always covers a roi's samples.
  * Per roi (sequential TPU grid): DMA the window from its level's HBM map
    into VMEM, then evaluate the bilinear interpolation as TWO small MXU
    matmuls with separable hat-weight matrices wy [S, WIN], wx [S, WIN]
    (bilinear weight of sample s to cell j = max(0, 1 - |pos_s - j|), on
    coordinates clamped to the level bounds; out-of-bounds samples zeroed)
    — instead of 4 scattered gathers per sample.
  * Backward: grad_window = wy^T @ grad @ wx, accumulated into the HBM
    grad buffer with read-modify-write DMA. TPU Pallas grids execute
    SEQUENTIALLY on a core, so overlapping roi windows accumulate safely
    without atomics (the CUDA kernel needs atomicAdd).

Numerics match `multilevel_roi_align` exactly (same boundary rules):
verified in tests/test_pallas_multilevel.py against the XLA path.
"""

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window size in cells. The LevelMapper bounds sqrt(area)/stride to
# [14, 28) at a roi's assigned level, but each AXIS extent scales with
# sqrt(aspect): extent_x <= 28*sqrt(w/h). WIN=64 keeps the kernel exact
# for aspect ratios up to ~((64-9)/28)^2 ~= 3.9 (and for level-clamped
# giant rois on P5, whose whole map fits the window for <= ~2048 px
# images); samples of more extreme boxes that overflow the window read
# as zero (documented deviation — RPN proposals are anchor-shaped,
# aspect {0.5..2} plus regression, so such boxes are vanishingly rare).
# Measured on v5e (tools/bench_roi_align.py, 768 rois, 14x14, bf16):
# fwd 1.47x / fwd+bwd 2.00x vs the XLA gather path at WIN=64.
WIN = 64

# Rois per forward grid step (G). Measured on v5e (bench_roi_align,
# async-dispatch timing): G=2 is NEITHER faster nor slower (5.7 vs 5.8
# ms fwd / 768 rois) — the per-roi cost is within-roi work (DMA waits,
# matmuls, layout moves), not grid-step machinery — and G=4 exceeds the
# 16 MB VMEM scoped limit. Default 1; override with
# CPM_TPU_POOLER_GROUP for A/Bs on other hardware.
import os as _os

FWD_GROUP = max(1, int(_os.environ.get("CPM_TPU_POOLER_GROUP", "1")))

# Forward window-prefetch depth (pipeline slots in the scratch ring).
# Depth D issues a roi's window DMA D-1 grid steps before its matmuls.
# Measured on v5e (1024 rois, 7x7, bf16): depth 3 is NEUTRAL (5.31 vs
# 5.27 ms fwd) and depth 4 fails scoped-VMEM allocation — together with
# the earlier G=2-neutral result this pins the ~5 us/roi floor on
# in-kernel scalar work (descriptor reconstruction, level-switch
# dispatch, per-step block writeback), not on DMA wait or grid-step
# count. Default stays at the classic double buffer; the knob remains
# for other hardware generations.
FWD_DEPTH = max(2, int(_os.environ.get("CPM_TPU_POOLER_DEPTH", "2")))

# Forward window-DMA tile geometry (rows x cols per descriptor).
# Fewer/larger tiles trade extra bytes (tiles past the roi's hat
# support can no longer be skipped at fine grain) for fewer descriptor
# constructions per roi (up to 8 start + 8 wait at 16x32, 1+1 at
# 64x64). Measured on v5e (1024 rois, 7x7, bf16, back-to-back):
# 64x64 = 5.12/10.37 ms fwd/fwd+bwd vs 16x32 = 5.24/10.47 — ~2%,
# within session noise. Together with the G- and depth-neutral results
# this rules descriptor handling OUT of the ~5 us/roi floor too; what
# remains is the within-roi serial chain (level-switch dispatch, hat
# construction, the two matmuls + the Mosaic-mandated transpose,
# writeback). Default stays at the fine-grain skip geometry, which
# also bounds DMA bytes for small-support rois.
# Cols must stay a multiple of 8 (sublane alignment).
FWD_TILE_ROWS = int(_os.environ.get("CPM_TPU_POOLER_TILE_ROWS", "16"))
FWD_TILE_COLS = int(_os.environ.get("CPM_TPU_POOLER_TILE_COLS", "32"))


def _pad_w8(f):
    """Pad the W dim to a multiple of 8: Mosaic DMA slices along the
    sublane (second-to-last) dim must be 8-aligned."""
    w = f.shape[2]
    wpad = ((w + 7) // 8) * 8
    if wpad != w:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, wpad - w), (0, 0)))
    return f


def _prep_rois(rois, levels, spatial_scales, level_hw, level_hw_pad,
               output_size, sr, aligned):
    """Host/XLA-side per-roi scalars for the kernel.

    Coordinate clamping uses the TRUE level dims (level_hw); window
    origins/extents use the W-padded dims the kernel DMAs from
    (level_hw_pad), with x origins aligned down to 8 cells.

    Returns (batch, y0, x0, ys, xs): window origins (int32) and
    per-sample positions RELATIVE to the window origin (f32).
    Shapes: [R], [R], [R], [R, Sy], [R, Sx].
    """
    ph, pw = output_size
    lvl = levels.astype(jnp.int32)
    hs = jnp.asarray(np.array([h for h, _ in level_hw], np.float32))[lvl]
    ws = jnp.asarray(np.array([w for _, w in level_hw], np.float32))[lvl]
    ws_pad = jnp.asarray(
        np.array([w for _, w in level_hw_pad], np.float32)
    )[lvl]
    wy_dim = jnp.asarray(
        np.array([min(WIN, h) for h, _ in level_hw_pad], np.float32)
    )[lvl]
    wx_dim = jnp.asarray(
        np.array([min(WIN, w) for _, w in level_hw_pad], np.float32)
    )[lvl]
    scale = jnp.asarray(np.asarray(spatial_scales, np.float32))[lvl]

    offset = 0.5 if aligned else 0.0
    r = rois.astype(jnp.float32)
    batch = rois[:, 0].astype(jnp.int32)
    x1 = r[:, 1] * scale - offset
    y1 = r[:, 2] * scale - offset
    x2 = r[:, 3] * scale - offset
    y2 = r[:, 4] * scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    ix = (jnp.arange(pw * sr, dtype=jnp.float32) + 0.5) / sr
    iy = (jnp.arange(ph * sr, dtype=jnp.float32) + 0.5) / sr
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]  # [R, Sx]
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]  # [R, Sy]
    oob_x = (xs < -1.0) | (xs > ws[:, None])
    oob_y = (ys < -1.0) | (ys > hs[:, None])
    xs_c = jnp.clip(xs, 0.0, ws[:, None] - 1.0)
    ys_c = jnp.clip(ys, 0.0, hs[:, None] - 1.0)

    # window origin: one cell before the first sample, clamped so the
    # static window stays inside the (padded) level map; x aligned down
    # to 8 cells (DMA sublane alignment) — the window is sized so the
    # up-to-7-cell coverage loss still leaves every sample inside
    x0 = jnp.clip(
        jnp.floor(jnp.min(xs_c, axis=1)) - 1.0, 0.0, ws_pad - wx_dim
    ).astype(jnp.int32)
    x0 = (x0 // 8) * 8
    y0 = jnp.clip(
        jnp.floor(jnp.min(ys_c, axis=1)) - 1.0, 0.0, hs - wy_dim
    ).astype(jnp.int32)

    xs_rel = xs_c - x0.astype(jnp.float32)[:, None]
    ys_rel = ys_c - y0.astype(jnp.float32)[:, None]
    xs_rel = jnp.where(oob_x, -2.0, xs_rel)  # hat weight = 0 everywhere
    ys_rel = jnp.where(oob_y, -2.0, ys_rel)
    # per-roi window support bounds (rows/cols with any nonzero hat
    # weight), precomputed here so the kernel reads SMEM scalars instead
    # of reducing the [S] position rows twice per roi (start + wait)
    need_r = jnp.maximum(
        jnp.max(ys_rel, axis=1).astype(jnp.int32) + 2, 0
    )
    need_c = jnp.maximum(
        jnp.max(xs_rel, axis=1).astype(jnp.int32) + 2, 0
    )
    return batch, y0, x0, ys_rel, xs_rel, need_r, need_c


def _hat_weights(pos_ref_row, wdim):
    """[S] relative positions -> [S, wdim] separable bilinear weights."""
    pos = pos_ref_row[:, None]  # [S, 1]
    # Mosaic's tpu.iota is integer-only; cast after
    cells = jax.lax.broadcasted_iota(jnp.int32, (1, wdim), 1).astype(
        jnp.float32
    )
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - cells))


def _fwd_kernel_body(level_hw, nlvl, sr, ph, pw, G, D,
                     lvl_ref, b_ref, y0_ref, x0_ref, valid_ref,
                     need_r_ref, need_c_ref,
                     ys_ref, xs_ref, *rest):
    feat_refs = rest[:nlvl]
    out_ref = rest[nlvl]          # [G, ph, pw, C] block
    win_scratch = rest[nlvl + 1]  # [D, G, WIN, WIN, C] prefetch ring
    sem = rest[nlvl + 2]          # DMA semaphores, shape (D, G)
    i = pl.program_id(0)
    NSTEP = pl.num_programs(0)
    slot = jax.lax.rem(i, D)
    C = win_scratch.shape[-1]
    sy, sx = ph * sr, pw * sr

    # --- grouped, double-buffered window DMA ----------------------
    # The grid runs over GROUPS of G rois: per-step fixed costs (grid
    # machinery, level-switch dispatch, descriptor accounting) amortize
    # over G rois -- they dominate the per-roi budget (~10 us/roi
    # measured at G=1 against ~1.6 us of matmuls). Roi j = s*G+g is
    # DMA'd into scratch slot [s%2, g] one grid step EARLY (prefetch at
    # step s-1) and awaited just before j's matmuls, overlapping window
    # fetches with the previous group's compute. Descriptors are
    # reconstructed at wait time with identical arguments; per-(slot, g)
    # semaphores keep the tile accounting of adjacent rois separate.
    # Tiles beyond the roi's sample support (rows >= max(ys)+2 /
    # cols >= max(xs)+2: bilinear hat weight 0 everywhere -- precomputed
    # in _prep_rois, read here as SMEM scalars) are skipped under the
    # SAME predicate at start and wait.
    def window_tiles(l):
        h, w = level_hw[l]
        hw_, ww_ = min(WIN, h), min(WIN, w)
        slab, half_w = FWD_TILE_ROWS, FWD_TILE_COLS
        tiles = []
        for s in range(0, hw_, slab):
            rows = min(slab, hw_ - s)
            for c in range(0, ww_, half_w):
                tiles.append((s, rows, c, min(half_w, ww_ - c)))
        return hw_, ww_, tiles

    def tile_copy(l, j, sl, g, s, rows, c, cols):
        # x origins are floor-aligned to 8 in _prep_rois; Mosaic needs
        # the hint to prove the DMA slice offset is tile-aligned
        x0 = pl.multiple_of(x0_ref[j], 8)
        return pltpu.make_async_copy(
            feat_refs[l].at[
                b_ref[j], pl.ds(y0_ref[j] + s, rows),
                pl.ds(x0 + c, cols), :
            ],
            win_scratch.at[sl, g, pl.ds(s, rows), pl.ds(c, cols), :],
            sem.at[sl, g],
        )

    def for_window(j, sl, g, start):
        """Issue (start=True) or await the guarded tile DMAs of roi j."""
        need_rows = need_r_ref[j]
        need_cols = need_c_ref[j]

        def branch(l):
            hw_, ww_, tiles = window_tiles(l)

            def do():
                if start and (hw_ < WIN or ww_ < WIN):
                    # stale scratch outside a small level's map gets
                    # weight 0, but 0 * garbage must not be 0 * NaN
                    win_scratch[sl, pl.ds(g, 1)] = jnp.zeros(
                        (1,) + win_scratch.shape[2:], win_scratch.dtype
                    )
                for s, rows, c, cols in tiles:

                    @pl.when((s < need_rows) & (c < need_cols))
                    def _tile(s=s, rows=rows, c=c, cols=cols):
                        d = tile_copy(l, j, sl, g, s, rows, c, cols)
                        if start:
                            d.start()
                        else:
                            d.wait()

            return do

        jax.lax.switch(lvl_ref[j], [branch(l) for l in range(nlvl)])

    def start_group(s, sl):
        for g in range(G):

            @pl.when(valid_ref[s * G + g] != 0)
            def _start(g=g):
                for_window(s * G + g, sl, g, start=True)

    # scratch VMEM is UNDEFINED at kernel start (can hold NaN bit
    # patterns on hardware, though interpret mode zeroes it): rows the
    # tile skip never writes must start at 0 so their zero weights
    # actually produce zeros. After that, stale rows hold a previous
    # roi's (finite) features -- also safe under weight 0.
    #
    # Pipeline fill: step 0 issues groups 0..D-2 into slots 0..D-2, then
    # every step issues group i+D-1 into slot (i+D-1)%D = (i-1)%D — the
    # slot whose previous occupant (group i-1) was awaited one step ago.
    @pl.when(i == 0)
    def _first():
        win_scratch[:] = jnp.zeros_like(win_scratch)
        for s in range(min(D - 1, NSTEP)):
            start_group(s, s)

    # prefetch D-1 steps ahead of the group being computed
    @pl.when(i + (D - 1) < NSTEP)
    def _prefetch():
        start_group(i + (D - 1), jax.lax.rem(i + (D - 1), D))

    for g in range(G):
        j = i * G + g

        # masked (padding) rois skip the window DMA + matmuls entirely
        # -- fixed-shape roi sets are often 40-70% padding on the train
        # path
        @pl.when(valid_ref[j] == 0)
        def _zero(g=g):
            out_ref[g] = jnp.zeros_like(out_ref[g])

        @pl.when(valid_ref[j] != 0)
        def _compute(j=j, g=g):
            for_window(j, slot, g, start=False)  # await roi j's tiles

            fd = win_scratch.dtype
            # matmuls in the feature dtype with f32 accumulation
            # (MXU-native for bf16); the window in its own dtype halves
            # VMEM pressure. For f32 FEATURES the MXU's default
            # precision would silently truncate the multiplicand
            # mantissas to bf16 (~1e-3 rel error vs the gather path);
            # HIGHEST runs the multi-pass f32 emulation so the opt-in
            # TPU.EVAL_POOLER_DTYPE='float32' path is genuinely f32
            # (matching the reference CUDA kernel's accumulation,
            # ROIAlign_cuda.cu:14). bf16 features keep the native path.
            prec = (jax.lax.Precision.HIGHEST
                    if fd == jnp.float32 else None)
            wy = _hat_weights(ys_ref[j], WIN).astype(fd)  # [Sy, WIN]
            wx = _hat_weights(xs_ref[j], WIN).astype(fd)  # [Sx, WIN]
            win = win_scratch[slot, g]  # [WIN, WIN, C]
            # contract y: [Sy, WIN] @ [WIN, WIN*C]
            t = jnp.dot(
                wy, win.reshape(WIN, WIN * C),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(sy, WIN, C)
            # contract x: [Sx, WIN] @ [WIN, Sy*C] (the explicit
            # transpose is Mosaic's supported layout for this step:
            # dot_general over t's middle dim + a minor-dim split of
            # the pooled result both fail vector-layout inference on
            # real hardware, though interpret mode accepts them)
            t = jnp.dot(
                wx.astype(jnp.float32),
                t.transpose(1, 0, 2).reshape(WIN, sy * C),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(sx, sy, C)
            vals = t.transpose(1, 0, 2)  # [Sy, Sx, C]
            pooled = vals.reshape(ph, sr, pw, sr, C).mean(axis=(1, 3))
            out_ref[g] = pooled.astype(out_ref.dtype)


def _bwd_kernel_body(level_hw, nlvl, sr, ph, pw,
                     lvl_ref, b_ref, y0_ref, x0_ref, valid_ref,
                     need_r_ref, need_c_ref,
                     ys_ref, xs_ref, *rest):
    g_ref = rest[0]                      # [1, ph, pw, C] block
    # rest[1:1+nlvl] are the aliased zero INPUT refs (unused); the
    # accumulators must be written through the OUTPUT refs
    grad_refs = rest[1 + nlvl:1 + 2 * nlvl]
    win_scratch = rest[1 + 2 * nlvl]
    sem = rest[2 + 2 * nlvl]
    i = pl.program_id(0)
    lvl = lvl_ref[i]
    b = b_ref[i]
    y0 = y0_ref[i]
    # x origins are floor-aligned to 8 in _prep_rois; Mosaic needs the
    # hint to prove the DMA slice offset is tile-aligned
    x0 = pl.multiple_of(x0_ref[i], 8)
    C = win_scratch.shape[-1]
    sy, sx = ph * sr, pw * sr

    valid = valid_ref[i] != 0  # masked rois contribute no gradient
    # rows/cols beyond every sample's hat support have zero weight ->
    # their gradient tile is zero and the read-modify-write is skipped
    # (bounds precomputed in _prep_rois, read as SMEM scalars)
    need_rows = need_r_ref[i]
    need_cols = need_c_ref[i]

    wy = _hat_weights(ys_ref[i], WIN)  # [Sy, WIN]
    wx = _hat_weights(xs_ref[i], WIN)
    # d pooled / d sample = 1/sr^2; expand grads to sample grid
    # (f32 incoming grads get true-f32 MXU passes, same rationale as
    # the forward; bf16 train grads keep the native path)
    prec = (jax.lax.Precision.HIGHEST
            if g_ref.dtype == jnp.float32 else None)
    g = g_ref[0].astype(jnp.float32) / float(sr * sr)  # [ph, pw, C]
    g = jnp.broadcast_to(
        g[:, None, :, None, :], (ph, sr, pw, sr, C)
    ).reshape(sy, sx, C)
    # contract the x samples first: B[sy, x, c] = sum_sx wx[sx, x] g
    bx = jnp.dot(
        wx.T, g.transpose(1, 0, 2).reshape(sx, sy * C),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(WIN, sy, C)
    b2 = bx.transpose(1, 0, 2).reshape(sy, WIN * C)

    def acc_branch(l):
        h, w = level_hw[l]
        hw_, ww_ = min(WIN, h), min(WIN, w)
        slab = win_scratch.shape[0]

        def do():
            # y-slab loop keeps the accumulator window out of VMEM all at
            # once; sequential grid -> read-modify-write is race-free on
            # TPU. Slabs beyond need_rows carry zero gradient and skip
            # the RMW entirely.
            ys0 = 0
            while ys0 < hw_:
                rows = min(slab, hw_ - ys0)

                @pl.when(ys0 < need_rows)
                def _rmw(ys0=ys0, rows=rows):
                    # gw rows [ys0:ys0+rows] = wy^T[rows, sy] @ B2
                    gw_slab = jnp.dot(
                        wy[:, ys0:ys0 + rows].T, b2,
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    ).reshape(rows, WIN, C)
                    for c in range(0, ww_, 32):
                        cols = min(32, ww_ - c)

                        @pl.when(c < need_cols)
                        def _half(c=c, cols=cols):
                            dma_in = pltpu.make_async_copy(
                                grad_refs[l].at[
                                    b, pl.ds(y0 + ys0, rows),
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
                                win_scratch[
                                    pl.ds(0, rows), pl.ds(c, cols), :
                                ]
                                + gw_slab[:, c:c + cols].astype(
                                    win_scratch.dtype
                                )
                            )
                            dma_out = pltpu.make_async_copy(
                                win_scratch.at[
                                    pl.ds(0, rows), pl.ds(c, cols), :
                                ],
                                grad_refs[l].at[
                                    b, pl.ds(y0 + ys0, rows),
                                    pl.ds(x0 + c, cols), :
                                ],
                                sem,
                            )
                            dma_out.start()
                            dma_out.wait()

                ys0 += rows

        return do

    @pl.when(valid)
    def _accumulate():
        jax.lax.switch(lvl, [acc_branch(l) for l in range(nlvl)])


def pallas_supported(level_hw, output_size, sampling_ratio,
                     channels=None) -> bool:
    """Static check: windows must cover roi extents (image <= ~WIN*32 px
    means the coarsest map fits in one window), sample counts must fit,
    and the channel dim must be lane-aligned (C % 128 == 0 — Mosaic
    cannot shape-cast [h, w, C] to [h, w*C] otherwise)."""
    h_top, w_top = level_hw[-1]
    if h_top > WIN or ((w_top + 7) // 8) * 8 > WIN:
        return False
    if channels is not None and channels % 128 != 0:
        return False
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    return ph * sr <= WIN and pw * sr <= WIN


@partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def multilevel_roi_align_pallas(
    features,
    rois_levels,
    output_size,
    spatial_scales,
    sampling_ratio=0,
    aligned=False,
    interpret=False,
):
    """Windowed Pallas multilevel RoIAlign.

    Args:
      features: tuple of [B, Hl, Wl, C] NHWC maps (finest first).
      rois_levels: (rois [R, 5], levels [R] int32) or
        (rois, levels, valid [R]) — masked rois output zeros and skip
        their window DMA + matmuls + gradient accumulation entirely.
    Returns: [R, ph, pw, C] in the feature dtype.
    """
    out, _ = _fwd(features, rois_levels, output_size, spatial_scales,
                  sampling_ratio, aligned, interpret)
    return out


def window_overflow_mask(
    features,
    rois,
    levels,
    output_size,
    spatial_scales,
    sampling_ratio=0,
    aligned=False,
):
    """[R] bool: True where the WIN-cell window cannot cover every
    bilinear source cell of the roi (extreme aspect ratios / giant
    level-clamped rois) — exactly the rois whose overflowing samples the
    kernel reads as zero. Used by the pooler's exactness fallback and by
    audit tooling.
    """
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    level_hw = tuple((int(f.shape[1]), int(f.shape[2])) for f in features)
    level_hw_pad = tuple(
        (h, ((w + 7) // 8) * 8) for h, w in level_hw
    )
    _, _, _, ys_rel, xs_rel, _, _ = _prep_rois(
        rois, levels, spatial_scales, level_hw, level_hw_pad,
        output_size, sr, aligned,
    )
    lvl = levels.astype(jnp.int32)
    wy_dim = jnp.asarray(
        np.array([min(WIN, h) for h, _ in level_hw_pad], np.float32)
    )[lvl]
    wx_dim = jnp.asarray(
        np.array([min(WIN, w) for _, w in level_hw_pad], np.float32)
    )[lvl]
    # a sample at relative pos p reads cells floor(p)/floor(p)+1; the
    # window holds cells [0, wdim): exact iff every in-bounds sample has
    # p <= wdim - 1 (oob samples are encoded as -2 and read zero by spec)
    over_y = jnp.max(ys_rel, axis=1) > wy_dim - 1.0
    over_x = jnp.max(xs_rel, axis=1) > wx_dim - 1.0
    return over_y | over_x


def _unpack_rois_levels(rois_levels):
    if len(rois_levels) == 3:
        rois, levels, valid = rois_levels
        valid = valid.astype(jnp.int32)
    else:
        rois, levels = rois_levels
        valid = jnp.ones(rois.shape[:1], jnp.int32)
    return rois, levels, valid


def _fwd(features, rois_levels, output_size, spatial_scales,
         sampling_ratio, aligned, interpret):
    rois, levels, valid = _unpack_rois_levels(rois_levels)
    features = tuple(features)
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    nlvl = len(features)
    level_hw = tuple((int(f.shape[1]), int(f.shape[2])) for f in features)
    padded = tuple(_pad_w8(f) for f in features)
    level_hw_pad = tuple(
        (int(f.shape[1]), int(f.shape[2])) for f in padded
    )
    C = features[0].shape[-1]
    R = rois.shape[0]

    batch, y0, x0, ys_rel, xs_rel, need_r, need_c = _prep_rois(
        rois, levels, spatial_scales, level_hw, level_hw_pad,
        output_size, sr, aligned,
    )

    # rois per grid step (see _fwd_kernel_body); the VMEM budget bounds
    # the prefetch ring to FWD_DEPTH*G*WIN*WIN*C elements — clamp the
    # depth so the ring stays within ~8 MB of the 16 MB scoped limit
    # (leaves room for the out block, sample rows, and Mosaic overhead)
    G = FWD_GROUP
    win_bytes = WIN * WIN * C * jnp.dtype(features[0].dtype).itemsize * G
    FWD_D = max(2, min(FWD_DEPTH, (8 << 20) // max(1, win_bytes)))
    R_pad = -(-R // G) * G
    if R_pad != R:
        pad = R_pad - R
        batch = jnp.pad(batch, (0, pad))
        y0 = jnp.pad(y0, (0, pad))
        x0 = jnp.pad(x0, (0, pad))
        need_r = jnp.pad(need_r, (0, pad))
        need_c = jnp.pad(need_c, (0, pad))
        valid = jnp.pad(valid, (0, pad))  # padding rois invalid
        levels = jnp.pad(levels, (0, pad))
        ys_rel = jnp.pad(ys_rel, ((0, pad), (0, 0)))
        xs_rel = jnp.pad(xs_rel, ((0, pad), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,  # lvl, batch, y0, x0, valid, need_r/c
        grid=(R_pad // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ys_rel [R, Sy]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xs_rel [R, Sx]
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in features],
        out_specs=pl.BlockSpec(
            (G, ph, pw, C), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            # D-deep prefetch ring: group i+D-1's windows DMA while
            # groups i..i+D-2 compute/await ahead of them
            pltpu.VMEM((FWD_D, G, WIN, WIN, C), features[0].dtype),
            pltpu.SemaphoreType.DMA((FWD_D, G)),
        ],
    )
    kernel = partial(
        _fwd_kernel_body, level_hw_pad, nlvl, sr, ph, pw, G, FWD_D
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (R_pad, ph, pw, C), features[0].dtype
        ),
        interpret=interpret,
    )(
        levels.astype(jnp.int32), batch, y0, x0, valid, need_r, need_c,
        ys_rel, xs_rel, *padded
    )
    if R_pad != R:
        out = out[:R]
    residuals = (features, rois_levels)
    return out, residuals


def _bwd(output_size, spatial_scales, sampling_ratio, aligned, interpret,
         residuals, g):
    features, rois_levels = residuals
    rois, levels, valid = _unpack_rois_levels(rois_levels)
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    nlvl = len(features)
    level_hw = tuple((int(f.shape[1]), int(f.shape[2])) for f in features)
    level_hw_pad = tuple(
        (h, ((w + 7) // 8) * 8) for h, w in level_hw
    )
    C = features[0].shape[-1]
    R = rois.shape[0]

    batch, y0, x0, ys_rel, xs_rel, need_r, need_c = _prep_rois(
        rois, levels, spatial_scales, level_hw, level_hw_pad,
        output_size, sr, aligned,
    )

    # grads accumulate in the FEATURE dtype (bf16 on the TPU compute
    # path, f32 in f32 tests) — matching the gather formulation, whose
    # XLA scatter-adds also accumulate in bf16, and halving the
    # read-modify-write DMA traffic that dominates this kernel
    # (W-padded buffers, cropped after)
    acc_dtype = features[0].dtype
    slab_rows = 32 if acc_dtype == jnp.bfloat16 else 16
    zeros = tuple(
        jnp.zeros((f.shape[0], hp, wp, C), acc_dtype)
        for f, (hp, wp) in zip(features, level_hw_pad)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ys_rel [R, Sy]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xs_rel [R, Sx]
            pl.BlockSpec(
                (1, ph, pw, C), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # grad out
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in features],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in features
        ),
        scratch_shapes=[
            # y-slab accumulator — a full window would not fit VMEM next
            # to the matmul intermediates
            pltpu.VMEM((slab_rows, WIN, C), acc_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = partial(_bwd_kernel_body, level_hw_pad, nlvl, sr, ph, pw)
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct(z.shape, acc_dtype) for z in zeros
        ),
        input_output_aliases={
            # zeros inputs alias the grad outputs for in-place
            # accumulation; indices count the full positional args
            # (7 prefetch + ys + xs + g = 10 before the zeros)
            10 + i: i for i in range(nlvl)
        },
        interpret=interpret,
    )(
        levels.astype(jnp.int32), batch, y0, x0, valid, need_r, need_c,
        ys_rel, xs_rel, g, *zeros,
    )
    grads = tuple(
        gr[:, :, : f.shape[2], :].astype(f.dtype)
        for gr, f in zip(grads, features)
    )
    return grads, None  # no grad wrt (rois, levels)


multilevel_roi_align_pallas.defvjp(_fwd, _bwd)
