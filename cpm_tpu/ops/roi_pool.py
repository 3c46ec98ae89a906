"""RoIPool (max pooling) and point-feature sampling.

Replaces the reference CUDA kernels:
  * ROIPool fwd/bwd (csrc/ROIPool/ROIPool_cuda.cu:12-83 — max pool with
    saved argmax; here the backward is XLA autodiff of the max);
  * PoolPointsInterp (csrc/PoolPointsInterp/PoolPointsInterp_cuda.cu —
    bilinear point-feature sampling, DensePose-style).

TPU-native: bins are evaluated with a fixed per-bin sample lattice and a
validity mask (the reference's variable ceil(roi/bin) cell iteration is
data-dependent; we oversample a static MAX_CELLS lattice and mask cells
outside the bin — exact for bins up to MAX_CELLS cells, documented
deviation above that).
"""

from typing import Tuple

import jax.numpy as jnp


def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float,
    max_cells_per_bin: int = 8,
) -> jnp.ndarray:
    """Max-pool RoI features.

    features: [B, H, W, C]; rois: [R, 5] (batch_idx, x1, y1, x2, y2).
    Returns [R, ph, pw, C]. Follows ROIPool_cuda.cu: integer bin bounds via
    round, empty bins produce 0.
    """
    ph, pw = output_size
    B, H, W, C = features.shape
    R = rois.shape[0]
    M = max_cells_per_bin

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1] * spatial_scale)
    y1 = jnp.round(rois[:, 2] * spatial_scale)
    x2 = jnp.round(rois[:, 3] * spatial_scale)
    y2 = jnp.round(rois[:, 4] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    py = jnp.arange(ph, dtype=features.dtype)
    px = jnp.arange(pw, dtype=features.dtype)
    # bin bounds (ROIPool_cuda.cu floor/ceil + clamp)
    hstart = jnp.clip(
        jnp.floor(py[None, :] * bin_h[:, None]) + y1[:, None], 0, H - 1
    )  # [R, ph]
    hend = jnp.clip(
        jnp.ceil((py[None, :] + 1) * bin_h[:, None]) + y1[:, None], 0, H
    )
    wstart = jnp.clip(
        jnp.floor(px[None, :] * bin_w[:, None]) + x1[:, None], 0, W - 1
    )  # [R, pw]
    wend = jnp.clip(
        jnp.ceil((px[None, :] + 1) * bin_w[:, None]) + x1[:, None], 0, W
    )

    cells = jnp.arange(M, dtype=features.dtype)
    ys = hstart[:, :, None] + cells[None, None, :]  # [R, ph, M]
    xs = wstart[:, :, None] + cells[None, None, :]  # [R, pw, M]
    y_valid = ys < hend[:, :, None]
    x_valid = xs < wend[:, :, None]
    yi = jnp.clip(ys, 0, H - 1).astype(jnp.int32)
    xi = jnp.clip(xs, 0, W - 1).astype(jnp.int32)

    flat = features.reshape(B * H * W, C)
    base = (batch_idx * H * W)[:, None, None, None, None]
    idx = base + yi[:, :, None, :, None] * W + xi[:, None, :, None, :]
    # [R, ph, pw, M, M]
    vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        R, ph, pw, M, M, C
    )
    valid = (
        y_valid[:, :, None, :, None] & x_valid[:, None, :, None, :]
    )[..., None]
    neg_inf = jnp.finfo(features.dtype).min
    vals = jnp.where(valid, vals, neg_inf)
    out = jnp.max(vals, axis=(3, 4))
    any_valid = jnp.any(valid, axis=(3, 4))
    return jnp.where(any_valid, out, 0.0)


def pool_points_interp(
    features: jnp.ndarray,
    points: jnp.ndarray,
    spatial_scale: float,
) -> jnp.ndarray:
    """Bilinear point-feature sampling (PoolPointsInterp_cuda.cu).

    features: [B, H, W, C]; points: [P, 3] (batch_idx, x, y) in image
    coords. Returns [P, C]; out-of-range points give zeros.
    """
    B, H, W, C = features.shape
    b = points[:, 0].astype(jnp.int32)
    x = points[:, 1] * spatial_scale
    y = points[:, 2] * spatial_scale
    oob = (x < -1.0) | (x > W) | (y < -1.0) | (y > H)
    xc = jnp.clip(x, 0.0, W - 1.0)
    yc = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    x1 = jnp.minimum(x0 + 1, W - 1.0)
    y1 = jnp.minimum(y0 + 1, H - 1.0)
    wx1 = xc - x0
    wx0 = 1.0 - wx1
    wy1 = yc - y0
    wy0 = 1.0 - wy1

    flat = features.reshape(B * H * W, C)
    base = b * H * W

    def g(yi, xi):
        return flat[base + yi.astype(jnp.int32) * W + xi.astype(jnp.int32)]

    out = (
        g(y0, x0) * (wy0 * wx0)[:, None]
        + g(y0, x1) * (wy0 * wx1)[:, None]
        + g(y1, x0) * (wy1 * wx0)[:, None]
        + g(y1, x1) * (wy1 * wx1)[:, None]
    )
    return jnp.where(oob[:, None], 0.0, out)
