"""Pallas TPU kernel: cluster-batched multilevel RoIAlign forward.

Tenth-pass pooler formulation (docs/PROFILE.md): rois whose bilinear
source cells fit a SHARED WIN-cell window are grouped, the group's
window is DMA'd once, and the first separable contraction runs batched
over the whole group — [G*Sy, WIN] @ [WIN, WIN*C] puts G*14 = 112 rows
on the MXU instead of 14 (~11% -> ~88% row occupancy). Measured upper
bound on v5e (tools/probe_pooler_crossroi.py, 1024 rois, 7x7, bf16):
3.72 us/roi at G=8 vs 4.71 in the same harness at G=1.

Clustering is pure XLA with fixed shapes (no host round trip):
  * window-origin lattice: rois whose per-roi window origin falls in the
    same (batch, level, y0//Q, x0//Q) lattice cell AND whose hat support
    fits the shared window placed at the cell origin
    (need + (origin - cell_origin) <= window dim) share a group;
  * ineligible rois (support too wide for the slack, or masked) become
    singleton groups at their own origin — numerics for them are
    IDENTICAL to the per-roi windowed kernel, including the
    window-overflow deviation, so `window_overflow_mask` and the
    pooler's tiered exactness patch apply unchanged;
  * groups are capped at G rois; a stable argsort over the lattice key
    makes group members contiguous, the kernel writes results through
    dynamic-offset DMA into sorted order, and a final gather restores
    roi order.

The grid is bounded at R//GRID_DIV steps; roi sets needing more groups
(poorly-clustering spreads) take a runtime lax.cond fallback to the
per-roi windowed kernel, so results are exact for EVERY distribution.

Backward reuses the per-roi windowed accumulation from
multilevel_pallas (the vjp is independent of the forward's internal
layout).

Numerics match `multilevel_roi_align` exactly for in-window rois:
verified against the gather path in tests/test_pallas_clustered.py and
bit-identical to the windowed kernel on device.

DISPOSITION (tenth pass, docs/PROFILE.md): opt-in via
TPU.POOLER_KERNEL: clustered; the default stays the windowed kernel.
On-chip the win only materializes when rois actually share windows
(up to 1.40x fwd at mean group 8); at the flagship train step's real
roi distributions it measured 97.6 vs 95.4 ms/step — slightly NEGATIVE
end-to-end (jittered/sampled proposals cluster at mean ~2.6, and the
full-window DMA forfeits the windowed kernel's support-bounded tile
skip). Kept for workloads with spatially dense roi sets.

Reference CUDA op being replaced: csrc/ROIAlign/ROIAlign_cuda.cu:14-120.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpm_tpu.ops.pallas.multilevel_pallas import (
    WIN,
    _bwd,
    _hat_weights,
    _pad_w8,
    _prep_rois,
    _unpack_rois_levels,
)

# group capacity (rois per shared window). G=8 measured best in the
# upper-bound probe; the batched hat matrix is [G*Sy, WIN].
GROUP = 8

# grid steps = R // GRID_DIV (empty trailing steps measured ~1.5 ms per
# 800 at the cls geometry). Distributions needing more groups than this
# fall back to the windowed kernel at runtime.
import os as _os

GRID_DIV = max(1, int(_os.environ.get("CPM_TPU_POOLER_CLUSTER_DIV", "4")))

# window-origin lattice pitch (cells). Smaller Q -> more slack for wide
# hat supports (eligibility needs support <= window dim - within-cell
# offset) but more lattice cells -> smaller groups. Must be a multiple
# of 8 so the shared x origin stays DMA sublane-aligned. 16 covers
# aspect ratios to ~2.7 at the LevelMapper's 28-cell extent bound.
LATTICE_Q = 16


def _cl_fwd_body(level_hw, nlvl, sr, ph, pw, G,
                 lvl_ref, b_ref, gy0_ref, gx0_ref, goff_ref, gsize_ref,
                 ys_ref, xs_ref, *rest):
    feat_refs = rest[:nlvl]
    out_ref = rest[nlvl]            # ANY [R, ph*pw, C], sorted order
    win_scratch = rest[nlvl + 1]    # [2, WIN, WIN, C] prefetch ring
    pooled_scr = rest[nlvl + 2]     # [2, G, P_pad, C] staging ring
    sem = rest[nlvl + 3]            # window DMA sems (2,)
    outsem = rest[nlvl + 4]         # out-copy sem
    s = pl.program_id(0)
    NSTEP = pl.num_programs(0)
    slot = jax.lax.rem(s, 2)
    C = win_scratch.shape[-1]
    R = out_ref.shape[0]
    Sy, Sx = ph * sr, pw * sr
    P_pad = pooled_scr.shape[2]  # ph*pw rounded up to 8 (DMA alignment)

    def window_dma(step, sl, start):
        def branch(l):
            h, w = level_hw[l]
            hw_, ww_ = min(WIN, h), min(WIN, w)

            def do():
                if start and (hw_ < WIN or ww_ < WIN):
                    # stale scratch outside a small level's map gets
                    # weight 0, but 0 * garbage must not be 0 * NaN
                    win_scratch[sl] = jnp.zeros(
                        win_scratch.shape[1:], win_scratch.dtype
                    )
                x0 = pl.multiple_of(gx0_ref[step], 8)
                d = pltpu.make_async_copy(
                    feat_refs[l].at[
                        b_ref[step], pl.ds(gy0_ref[step], hw_),
                        pl.ds(x0, ww_), :
                    ],
                    win_scratch.at[sl, pl.ds(0, hw_), pl.ds(0, ww_), :],
                    sem.at[sl],
                )
                if start:
                    d.start()
                else:
                    d.wait()

            return do

        jax.lax.switch(lvl_ref[step], [branch(l) for l in range(nlvl)])

    # masked rois never enter groups (their output rows are zeroed
    # XLA-side), so a group's slots are all real valid rois and empty
    # steps exist only in the packed tail
    @pl.when(s == 0)
    def _first():
        @pl.when(gsize_ref[0] > 0)
        def _issue():
            window_dma(0, 0, start=True)

    @pl.when(s + 1 < NSTEP)
    def _prefetch():
        @pl.when(gsize_ref[s + 1] > 0)
        def _issue():
            window_dma(s + 1, jax.lax.rem(s + 1, 2), start=True)

    def out_copy(step, sl, g):
        return pltpu.make_async_copy(
            pooled_scr.at[sl, pl.ds(g, 1)],
            out_ref.at[pl.ds(goff_ref[step] + g, 1)],
            outsem,
        )

    def wait_prev_copies():
        # groups are PACKED (empty steps only in the tail), so the
        # previous step of any active step s > 0 always issued copies;
        # await them now — one step late, so the copies overlapped the
        # previous step's matmuls instead of serializing after them
        @pl.when(s > 0)
        def _wait():
            for g in range(G):

                @pl.when(g < gsize_ref[s - 1])
                def _w(g=g):
                    out_copy(s - 1, jax.lax.rem(s - 1, 2), g).wait()

    def issue_copies_and_maybe_drain():
        for g in range(G):

            @pl.when(g < gsize_ref[s])
            def _c(g=g):
                out_copy(s, slot, g).start()

        # the last active step must drain its own copies: the trailing
        # empty steps never wait
        last_active = jnp.logical_or(
            s + 1 >= NSTEP, gsize_ref[jnp.minimum(s + 1, NSTEP - 1)] == 0
        )

        @pl.when(last_active)
        def _drain():
            for g in range(G):

                @pl.when(g < gsize_ref[s])
                def _w(g=g):
                    out_copy(s, slot, g).wait()

    @pl.when(gsize_ref[s] > 0)
    def _compute():
        wait_prev_copies()
        window_dma(s, slot, start=False)
        fd = win_scratch.dtype
        # f32 features: HIGHEST so the MXU does not truncate to bf16
        # (see the windowed kernel); bf16 keeps the native path
        prec = (jax.lax.Precision.HIGHEST
                if fd == jnp.float32 else None)
        win = win_scratch[slot]  # [WIN, WIN, C]
        goff = goff_ref[s]
        gsize = gsize_ref[s]

        # slot index, clamped: slots past the group's end still feed the
        # batched matmul (their rows are discarded) but must not read
        # out of bounds
        def pidx(g):
            return jnp.minimum(goff + g, R - 1)

        # batched first contraction over the whole group. Hats built
        # per-slot then concatenated — _hat_weights on a reshaped
        # (G*Sy,) row crashes the Mosaic compiler at G >= 2
        wy = jnp.concatenate(
            [_hat_weights(ys_ref[pidx(g)], WIN) for g in range(G)],
            axis=0,
        ).astype(fd)  # [G*Sy, WIN]
        t = jnp.dot(
            wy, win.reshape(WIN, WIN * C),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).reshape(G * Sy, WIN, C)

        for g in range(G):

            @pl.when(g < gsize)
            def _slot(g=g):
                wx = _hat_weights(xs_ref[pidx(g)], WIN)  # [Sx, WIN] f32
                tg = t[g * Sy : (g + 1) * Sy]
                # same Mosaic-supported layout as the windowed kernel:
                # transpose + [Sx, WIN] @ [WIN, Sy*C]
                tg = jnp.dot(
                    wx,
                    tg.transpose(1, 0, 2).reshape(WIN, Sy * C),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ).reshape(Sx, Sy, C)
                vals = tg.transpose(1, 0, 2)
                pooled = vals.reshape(ph, sr, pw, sr, C).mean(axis=(1, 3))
                pooled = pooled.reshape(ph * pw, C)
                if P_pad != ph * pw:
                    pooled = jnp.concatenate(
                        [pooled,
                         jnp.zeros((P_pad - ph * pw, C), pooled.dtype)],
                        axis=0,
                    )
                pooled_scr[slot, g] = pooled.astype(pooled_scr.dtype)

        issue_copies_and_maybe_drain()


def _cluster(levels, batch, y0, x0, need_r, need_c, valid,
             level_hw_pad, G):
    """Fixed-shape XLA grouping.

    Returns (order, el_s, slot_gy0, slot_gx0, lvl_g, b_g, gy0_g, gx0_g,
    goff_g, gsize): the stable sort permutation, per-SLOT eligibility +
    group origins (sorted order), and per-GROUP leader arrays (length R;
    empty groups have size 0)."""
    R = levels.shape[0]
    lvl = levels.astype(jnp.int32)
    wy_dim = jnp.asarray(
        np.array([min(WIN, h) for h, _ in level_hw_pad], np.int32)
    )[lvl]
    wx_dim = jnp.asarray(
        np.array([min(WIN, w) for _, w in level_hw_pad], np.int32)
    )[lvl]

    vmask = valid.astype(bool)
    cy = (y0 // LATTICE_Q) * LATTICE_Q
    cx = (x0 // LATTICE_Q) * LATTICE_Q
    # shared window placed at the cell origin must cover the roi's hat
    # support; origins are clamped in _prep_rois so cy <= y0 holds
    fits = ((y0 - cy) + need_r <= wy_dim) & ((x0 - cx) + need_c <= wx_dim)
    eligible = fits & vmask

    ny = max(h for h, _ in level_hw_pad) // LATTICE_Q + 2
    nx = max(w for _, w in level_hw_pad) // LATTICE_Q + 2
    nlvl = len(level_hw_pad)
    cell = ((batch * nlvl + lvl) * ny + cy // LATTICE_Q) * nx \
        + cx // LATTICE_Q
    arange = jnp.arange(R, dtype=jnp.int32)
    # ineligible-but-valid rois: unique sentinel keys -> singleton
    # groups; MASKED rois sort last and never enter any group (their
    # output rows are zeroed XLA-side, so the kernel skips them with no
    # per-group bookkeeping at all)
    big = (jnp.max(batch) + 2) * nlvl * ny * nx
    key = jnp.where(eligible, cell, big + arange.astype(cell.dtype))
    key = jnp.where(vmask, key, big + R + arange.astype(cell.dtype))

    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    valid_s = vmask[order]
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), key_s[1:] != key_s[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(boundary, arange, 0))
    pos_in_run = arange - run_start
    # groups open only at valid slots; the invalid tail joins no group
    new_group = (boundary | (pos_in_run % G == 0)) & valid_s
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1  # [R] slot -> group
    n_groups = jnp.sum(new_group.astype(jnp.int32))

    el_s = eligible[order]
    slot_gy0 = jnp.where(el_s, cy[order], y0[order])
    slot_gx0 = jnp.where(el_s, cx[order], x0[order])

    def scatter_leader(vals):
        # leader slots define the group's data; non-leaders scatter to
        # the dropped index R
        idx = jnp.where(new_group, gid, R)
        return jnp.zeros((R,), vals.dtype).at[idx].set(vals, mode="drop")

    lvl_g = scatter_leader(lvl[order])
    b_g = scatter_leader(batch[order])
    gy0_g = scatter_leader(slot_gy0)
    gx0_g = scatter_leader(slot_gx0)
    goff_g = scatter_leader(arange)
    # membership counts only valid slots (gid of an invalid slot points
    # at the last open group but contributes 0; all-invalid inputs give
    # gid == -1 with 0 contributions — harmless wrap)
    gsize = jnp.zeros((R,), jnp.int32).at[
        jnp.where(valid_s, gid, R)
    ].add(valid_s.astype(jnp.int32), mode="drop")
    return (order, el_s, slot_gy0, slot_gx0,
            lvl_g, b_g, gy0_g, gx0_g, goff_g, gsize, n_groups)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def multilevel_roi_align_clustered(
    features,
    rois_levels,
    output_size,
    spatial_scales,
    sampling_ratio=0,
    aligned=False,
    interpret=False,
):
    """Cluster-batched Pallas multilevel RoIAlign (same contract as
    multilevel_roi_align_pallas)."""
    out, _ = _cl_fwd(features, rois_levels, output_size, spatial_scales,
                     sampling_ratio, aligned, interpret)
    return out


def _cl_fwd(features, rois_levels, output_size, spatial_scales,
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
    # group capacity bounded by the batched f32 intermediate
    # t [G*Sy, WIN, C] against the 16 MB scoped-VMEM limit (alongside
    # the window ring + staging): 8 at 7x7, 4 at 14x14 with C=256
    Sy_ = ph * (sampling_ratio if sampling_ratio > 0 else 2)
    G = GROUP
    while G > 1 and G * Sy_ * WIN * C * 4 > (8 << 20):
        G //= 2
    P_pad = ((ph * pw + 7) // 8) * 8

    batch, y0, x0, ys_rel, xs_rel, need_r, need_c = _prep_rois(
        rois, levels, spatial_scales, level_hw, level_hw_pad,
        output_size, sr, aligned,
    )

    (order, el_s, slot_gy0, slot_gx0,
     lvl_g, b_g, gy0_g, gx0_g, goff_g, gsize, n_groups) = _cluster(
        levels, batch, y0, x0, need_r, need_c, valid, level_hw_pad, G,
    )

    # per-slot sample positions re-based to the GROUP origin. The oob
    # sentinel (-2: zero hat weight everywhere) must survive the shift.
    shift_y = (y0[order] - slot_gy0).astype(jnp.float32)
    shift_x = (x0[order] - slot_gx0).astype(jnp.float32)
    ys_s = ys_rel[order]
    xs_s = xs_rel[order]
    ys_s = jnp.where(ys_s <= -1.5, -2.0, ys_s + shift_y[:, None])
    xs_s = jnp.where(xs_s <= -1.5, -2.0, xs_s + shift_x[:, None])

    # bounded grid: empty trailing steps are not free (~1.5 ms at 800
    # skipped steps, measured on v5e), so the grid is R//GRID_DIV steps.
    # Realistic roi sets cluster to ~R/4.8 groups; distributions that
    # do not (all-singleton spreads) fall back to the per-roi windowed
    # kernel at runtime via lax.cond.
    NG = max(1, R // GRID_DIV)

    def run_clustered(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,  # lvl_g, b_g, gy0, gx0, goff, gsize
            grid=(NG,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # ys_s [R, Sy]
                pl.BlockSpec(memory_space=pltpu.VMEM),  # xs_s [R, Sx]
            ]
            + [pl.BlockSpec(memory_space=pl.ANY) for _ in features],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, WIN, WIN, C), features[0].dtype),
                # parity ring of staging blocks (waits deferred one
                # step); ph*pw rounded up to 8: DMA slices along the
                # sublane dim must be 8-aligned
                pltpu.VMEM((2, G, P_pad, C), features[0].dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        kernel = partial(_cl_fwd_body, level_hw_pad, nlvl, sr, ph, pw, G)
        out_sorted = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (R, P_pad, C), features[0].dtype
            ),
            interpret=interpret,
        )(
            lvl_g[:NG], b_g[:NG], gy0_g[:NG], gx0_g[:NG], goff_g[:NG],
            gsize[:NG], ys_s, xs_s, *padded
        )
        inv = jnp.argsort(order)
        out = out_sorted[inv, : ph * pw].reshape(R, ph, pw, C)
        # masked rois (and rows no group wrote) -> zeros. jnp.where, not
        # multiply: unwritten rows of the pl.ANY output buffer are
        # uninitialized HBM, and 0 * NaN/Inf garbage would stay NaN
        # (the same hazard the kernel guards for win_scratch).
        return jnp.where(
            valid.astype(bool)[:, None, None, None], out,
            jnp.zeros((), out.dtype),
        )

    def run_windowed(_):
        from cpm_tpu.ops.pallas.multilevel_pallas import _fwd as _w_fwd

        out, _ = _w_fwd(features, rois_levels, output_size,
                        spatial_scales, sampling_ratio, aligned,
                        interpret)
        return out

    out = jax.lax.cond(n_groups <= NG, run_clustered, run_windowed, 0)
    residuals = (features, rois_levels)
    return out, residuals


def _cl_bwd(output_size, spatial_scales, sampling_ratio, aligned,
            interpret, residuals, g):
    # per-roi windowed accumulation (multilevel_pallas._bwd) — the vjp
    # is independent of the forward's clustering
    return _bwd(output_size, spatial_scales, sampling_ratio, aligned,
                interpret, residuals, g)


multilevel_roi_align_clustered.defvjp(_cl_fwd, _cl_bwd)
