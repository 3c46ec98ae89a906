"""Pallas TPU RoIAlign forward kernel.

Replaces the XLA gather formulation of cpm_tpu.ops.roi_align.roi_align for
the TPU hot path (the reference's CUDA kernel is
/root/reference/pet/lib/ops/csrc/ROIAlign/ROIAlign_cuda.cu:14-120).

Design (TPU memory model):
  * features stay in HBM (pl.ANY); one grid step per RoI;
  * roi coordinates arrive via scalar prefetch (SMEM) so the kernel can
    compute its DMA indices before the body runs;
  * for each of the ph*sr sample rows, the kernel DMAs the two bilinear
    source rows [W, C] HBM->VMEM once and reuses them for every sample
    column — W*C*2 floats per row-pair instead of 4 scalar gathers per
    sample point (the CUDA kernel's random-access pattern would be
    DMA-latency-bound on TPU);
  * column interpolation + bin averaging are expressed as one small
    one-hot matmul per sample row: `W_bin [pw, W] @ row [W, C]` — the
    gather becomes MXU work (Mosaic has no general VMEM gather), and the
    x-bilinear weights and 1/sr^2 bin normalization are folded into
    W_bin's two nonzeros per sample column.

Backward uses the jnp reference implementation's autodiff (scatter-add),
wired via jax.custom_vjp so jitted training uses this kernel forward.

Status: verified bit-close to the XLA reference on real TPU (v5e), but the
full-width row DMA makes it read W/window more bytes than needed (measured
12.5ms vs 7.4ms XLA-gather at 512 rois on P2). The planned perf-pass
redesign DMAs a fixed 32x32 feature window per roi (level-mapper-assigned
rois span ~14 cells), cutting HBM traffic ~20x below the gather path. The
framework default remains cpm_tpu.ops.roi_align until the windowed kernel
lands.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpm_tpu.ops.roi_align import roi_align as roi_align_ref


@functools.partial(
    jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio")
)
def roi_align_pallas_fwd(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 0.25,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Forward-only Pallas RoIAlign (bilinear, unaligned, static sr)."""
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    B, H, W, C = features.shape
    R = rois.shape[0]

    # precompute feature-space roi coords, pad row to 8 scalars for SMEM
    scaled = jnp.concatenate(
        [rois[:, 0:1], rois[:, 1:5] * spatial_scale, jnp.zeros((R, 3))],
        axis=1,
    ).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, ph, pw, C),
            lambda r, *_: (r, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, W, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel_wrap(rois_s, feat, out, rows, sem):
        # out block is [1, ph, pw, C]; present as [ph, pw, C]
        _kernel_body(rois_s, feat, out, rows, sem, ph=ph, pw=pw, sr=sr, H=H, W=W)

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, ph, pw, C), jnp.float32),
    )(scaled, features.astype(jnp.float32))
    return out


def _kernel_body(rois_ref, feat_ref, out_ref, rows_vmem, sem, *, ph, pw, sr, H, W):
    r = pl.program_id(0)
    b = rois_ref[r, 0].astype(jnp.int32)
    x1 = rois_ref[r, 1]
    y1 = rois_ref[r, 2]
    x2 = rois_ref[r, 3]
    y2 = rois_ref[r, 4]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    out_ref[...] = jnp.zeros_like(out_ref)

    n_cols = pw * sr
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cols, W), 0)[
        :, 0:1
    ].astype(jnp.float32)
    xs = x1 + (col_ids + 0.5) / sr * bin_w  # [n_cols, 1]
    x_oob = (xs < -1.0) | (xs > W)
    xc = jnp.clip(xs, 0.0, W - 1.0)
    x_lo = jnp.floor(xc)
    x_hi = jnp.minimum(x_lo + 1.0, W - 1.0)
    wx_hi = jnp.where(x_oob, 0.0, xc - x_lo)
    wx_lo = jnp.where(x_oob, 0.0, 1.0 - (xc - x_lo))

    # one-hot x-interpolation matrix: two nonzeros per sample column
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (n_cols, W), 1).astype(
        jnp.float32
    )
    wx = (w_iota == x_lo) * wx_lo + (w_iota == x_hi) * wx_hi  # [n_cols, W]
    # fold bin averaging: B [pw, n_cols] sums each bin's sr columns / sr^2
    b_row = jax.lax.broadcasted_iota(jnp.int32, (pw, n_cols), 0)
    b_col = jax.lax.broadcasted_iota(jnp.int32, (pw, n_cols), 1)
    bin_mat = (b_row == b_col // sr).astype(jnp.float32) / (sr * sr)
    # f32 features: HIGHEST precision so the MXU does not truncate the
    # f32 multiplicands to bf16 (see multilevel_pallas); bf16 native
    prec = (jax.lax.Precision.HIGHEST
            if feat_ref.dtype == jnp.float32 else None)
    w_bin = jnp.dot(
        bin_mat, wx, preferred_element_type=jnp.float32, precision=prec
    )  # [pw, W]

    def sample_row(i, _):
        ys = y1 + (i.astype(jnp.float32) + 0.5) / sr * bin_h
        y_oob = (ys < -1.0) | (ys > H)
        yc = jnp.clip(ys, 0.0, H - 1.0)
        y_lo = jnp.floor(yc)
        y_hi = jnp.minimum(y_lo + 1.0, H - 1.0)
        wy_hi = yc - y_lo
        wy_lo = 1.0 - wy_hi
        y_lo_i = y_lo.astype(jnp.int32)
        y_hi_i = y_hi.astype(jnp.int32)

        cp0 = pltpu.make_async_copy(
            feat_ref.at[b, y_lo_i], rows_vmem.at[0], sem.at[0]
        )
        cp1 = pltpu.make_async_copy(
            feat_ref.at[b, y_hi_i], rows_vmem.at[1], sem.at[1]
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

        row = jnp.where(
            y_oob, 0.0, wy_lo * rows_vmem[0] + wy_hi * rows_vmem[1]
        )  # [W, C]
        binned = jnp.dot(
            w_bin, row, preferred_element_type=jnp.float32,
            precision=prec,
        )  # [pw, C]
        py = i // sr
        out_ref[0, py, :, :] += binned
        return 0

    jax.lax.fori_loop(0, ph * sr, sample_row, 0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4)
)
def roi_align_tpu(features, rois, output_size, spatial_scale, sampling_ratio):
    """RoIAlign with Pallas forward + XLA-autodiff backward."""
    return roi_align_pallas_fwd(
        features, rois, output_size, spatial_scale, sampling_ratio
    )


def _fwd(features, rois, output_size, spatial_scale, sampling_ratio):
    out = roi_align_pallas_fwd(
        features, rois, output_size, spatial_scale, sampling_ratio
    )
    return out, (features, rois)


def _bwd(output_size, spatial_scale, sampling_ratio, res, g):
    features, rois = res
    _, vjp = jax.vjp(
        lambda f: roi_align_ref(
            f, rois, output_size, spatial_scale, sampling_ratio
        ),
        features,
    )
    (df,) = vjp(g.astype(features.dtype))
    return df, jnp.zeros_like(rois)


roi_align_tpu.defvjp(_fwd, _bwd)
