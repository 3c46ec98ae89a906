"""RoIAlign for TPU.

Replaces the reference CUDA kernels
(/root/reference/pet/lib/ops/csrc/ROIAlign/ROIAlign_cuda.cu: bilinear and
nearest forward at :14/:36, atomic-add backward at :259) with an XLA
formulation: sample-point gathers + bilinear weights. The backward pass is
XLA autodiff of the gather (a scatter-add — exactly the atomic-add pattern,
but deterministic). A Pallas kernel (same signature) is provided in
`cpm_tpu.ops.pallas.roi_align_pallas` for the hot path.

TPU design deviations (documented):
  * `sampling_ratio == 0` (adaptive `ceil(roi_size/bin)`, data-dependent) is
    mapped to a static 2 samples per bin — fixed shapes are required under
    jit; with the standard 7x7/14x14 pools this matches the adaptive count
    for typical FPN-assigned RoIs.
  * RoIs are padded arrays with a validity mask; invalid rois produce zeros.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_weights_1d(coord, size):
    """coord: [...] float sample positions. Returns (lo_idx, hi_idx, w_lo, w_hi).

    Matches the CUDA `bilinear_interpolate` boundary rules
    (ROIAlign_cuda.cu): if coord < -1 or > size, the sample is zero
    (handled by caller via in-bounds mask); else clamp to [0, size-1].
    """
    oob = (coord < -1.0) | (coord > size)
    c = jnp.clip(coord, 0.0, size - 1.0)
    lo = jnp.floor(c)
    hi = jnp.minimum(lo + 1.0, size - 1.0)
    w_hi = c - lo
    w_lo = 1.0 - w_hi
    return lo.astype(jnp.int32), hi.astype(jnp.int32), w_lo, w_hi, oob


def _nearest_index_1d(coord, size):
    oob = (coord < -1.0) | (coord > size)
    c = jnp.clip(coord, 0.0, size - 1.0)
    # CUDA nearest kernel truncates the clamped coordinate
    return c.astype(jnp.int32), oob


@partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "spatial_scale",
        "sampling_ratio",
        "aligned",
        "interpolation",
    ),
)
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size,
    spatial_scale: float,
    sampling_ratio: int = 0,
    aligned: bool = False,
    interpolation: str = "bilinear",
):
    """RoIAlign over a single feature map.

    Args:
      features: [B, H, W, C] (NHWC).
      rois: [R, 5] — (batch_index, x1, y1, x2, y2) in image coords.
      output_size: (ph, pw).
      spatial_scale: feature_stride^-1.
      sampling_ratio: samples per bin per axis; 0 -> static 2 (see module doc).
      aligned: half-pixel (V2) alignment.
      interpolation: 'bilinear' or 'nearest'.

    Returns:
      [R, ph, pw, C]
    """
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    b, h, w, c = features.shape
    r = rois.shape[0]

    offset = 0.5 if aligned else 0.0
    batch_idx = rois[:, 0].astype(jnp.int32)
    # coordinate arithmetic always in f32: under bf16 compute the feature
    # values may be bf16, but bf16 has only 8 mantissa bits — image-scale
    # coordinates (up to ~1333) would quantize to multiples of 8
    rois = rois.astype(jnp.float32)
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset

    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / pw  # [R]
    bin_h = roi_h / ph

    # sample coordinates: x = x1 + (px*sr + ix + 0.5) * bin_w / sr
    ix = (jnp.arange(pw * sr, dtype=jnp.float32) + 0.5) / sr  # [pw*sr]
    iy = (jnp.arange(ph * sr, dtype=jnp.float32) + 0.5) / sr
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]  # [R, pw*sr]
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]  # [R, ph*sr]

    flat = features.reshape(b * h * w, c)
    base = batch_idx * (h * w)  # [R]

    if interpolation == "bilinear":
        x_lo, x_hi, wx_lo, wx_hi, x_oob = _bilinear_weights_1d(xs, w)
        y_lo, y_hi, wy_lo, wy_hi, y_oob = _bilinear_weights_1d(ys, h)

        def gather(yi, xi):
            idx = base[:, None, None] + yi[:, :, None] * w + xi[:, None, :]
            return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                r, ph * sr, pw * sr, c
            )

        v00 = gather(y_lo, x_lo)
        v01 = gather(y_lo, x_hi)
        v10 = gather(y_hi, x_lo)
        v11 = gather(y_hi, x_hi)
        # interp weights cast to the feature dtype so the big [R, s, s, C]
        # intermediates stay in compute precision (no silent f32 upcast)
        fd = features.dtype
        wyl = wy_lo.astype(fd)[:, :, None, None]
        wyh = wy_hi.astype(fd)[:, :, None, None]
        wxl = wx_lo.astype(fd)[:, None, :, None]
        wxh = wx_hi.astype(fd)[:, None, :, None]
        vals = (
            v00 * wyl * wxl + v01 * wyl * wxh + v10 * wyh * wxl + v11 * wyh * wxh
        )
        oob = y_oob[:, :, None] | x_oob[:, None, :]
        vals = jnp.where(oob[..., None], 0.0, vals)
    elif interpolation == "nearest":
        xi, x_oob = _nearest_index_1d(xs, w)
        yi, y_oob = _nearest_index_1d(ys, h)
        idx = base[:, None, None] + yi[:, :, None] * w + xi[:, None, :]
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            r, ph * sr, pw * sr, c
        )
        oob = y_oob[:, :, None] | x_oob[:, None, :]
        vals = jnp.where(oob[..., None], 0.0, vals)
    else:
        raise ValueError(interpolation)

    # average within each bin: [R, ph, sr, pw, sr, C] -> mean over the two sr axes
    vals = vals.reshape(r, ph, sr, pw, sr, c)
    return jnp.mean(vals, axis=(2, 4))


def _bilinear_weights_1d_sized(coord, size):
    """Like _bilinear_weights_1d but with a per-roi `size` array
    (broadcastable against coord)."""
    oob = (coord < -1.0) | (coord > size)
    c = jnp.clip(coord, 0.0, size - 1.0)
    lo = jnp.floor(c)
    hi = jnp.minimum(lo + 1.0, size - 1.0)
    w_hi = c - lo
    w_lo = 1.0 - w_hi
    return lo.astype(jnp.int32), hi.astype(jnp.int32), w_lo, w_hi, oob


def multilevel_roi_align(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size,
    spatial_scales,
    sampling_ratio: int = 0,
    aligned: bool = False,
    interpolation: str = "bilinear",
):
    """RoIAlign over FPN levels with ONE gather per sample corner.

    TPU-first replacement for evaluating RoIAlign on every level and
    one-hot-selecting (the round-1 Pooler): all level maps are flattened
    into one [sum(B*Hl*Wl), C] buffer and each roi gathers from its
    assigned level's region — 1x the gather/interp work instead of Lx.
    Matches the reference Pooler's per-level scatter semantics
    (/root/reference/pet/rcnn/utils/poolers.py:111-131) with fixed shapes.

    Args:
      features: list of [B, Hl, Wl, C] NHWC maps, finest first.
      rois: [R, 5] (batch_index, x1, y1, x2, y2) image coords.
      levels: [R] int32 in [0, L).
      spatial_scales: per-level 1/stride.

    Returns: [R, ph, pw, C].
    """
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    L = len(features)
    assert L == len(spatial_scales)
    b = features[0].shape[0]
    c = features[0].shape[-1]
    r = rois.shape[0]

    hs = np.array([f.shape[1] for f in features], np.int32)
    ws = np.array([f.shape[2] for f in features], np.int32)
    sizes = hs.astype(np.int64) * ws.astype(np.int64) * b
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)

    flat = jnp.concatenate(
        [f.reshape(b * int(h) * int(w), c) for f, h, w in zip(features, hs, ws)],
        axis=0,
    )

    lvl = levels.astype(jnp.int32)
    h_l = jnp.asarray(hs)[lvl].astype(jnp.float32)  # [R]
    w_l = jnp.asarray(ws)[lvl].astype(jnp.float32)
    wi_l = jnp.asarray(ws)[lvl]  # int [R]
    hi_l = jnp.asarray(hs)[lvl]
    off_l = jnp.asarray(offs)[lvl]
    scale = jnp.asarray(np.asarray(spatial_scales, np.float32))[lvl]  # [R]

    offset = 0.5 if aligned else 0.0
    batch_idx = rois[:, 0].astype(jnp.int32)
    rois = rois.astype(jnp.float32)
    x1 = rois[:, 1] * scale - offset
    y1 = rois[:, 2] * scale - offset
    x2 = rois[:, 3] * scale - offset
    y2 = rois[:, 4] * scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    ix = (jnp.arange(pw * sr, dtype=jnp.float32) + 0.5) / sr
    iy = (jnp.arange(ph * sr, dtype=jnp.float32) + 0.5) / sr
    xs = x1[:, None] + ix[None, :] * bin_w[:, None]  # [R, pw*sr]
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]  # [R, ph*sr]

    # flat index of (b, y, x) at the roi's level:
    # off + (b*Hl + y) * Wl + x
    base = off_l + batch_idx * hi_l * wi_l  # [R]

    if interpolation == "bilinear":
        x_lo, x_hi, wx_lo, wx_hi, x_oob = _bilinear_weights_1d_sized(
            xs, w_l[:, None]
        )
        y_lo, y_hi, wy_lo, wy_hi, y_oob = _bilinear_weights_1d_sized(
            ys, h_l[:, None]
        )

        def gather(yi, xi):
            idx = (
                base[:, None, None]
                + yi[:, :, None] * wi_l[:, None, None]
                + xi[:, None, :]
            )
            return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                r, ph * sr, pw * sr, c
            )

        v00 = gather(y_lo, x_lo)
        v01 = gather(y_lo, x_hi)
        v10 = gather(y_hi, x_lo)
        v11 = gather(y_hi, x_hi)
        fd = flat.dtype
        wyl = wy_lo.astype(fd)[:, :, None, None]
        wyh = wy_hi.astype(fd)[:, :, None, None]
        wxl = wx_lo.astype(fd)[:, None, :, None]
        wxh = wx_hi.astype(fd)[:, None, :, None]
        vals = (
            v00 * wyl * wxl + v01 * wyl * wxh + v10 * wyh * wxl + v11 * wyh * wxh
        )
        oob = y_oob[:, :, None] | x_oob[:, None, :]
        vals = jnp.where(oob[..., None], 0.0, vals)
    elif interpolation == "nearest":
        xi_n = jnp.clip(xs, 0.0, w_l[:, None] - 1.0).astype(jnp.int32)
        yi_n = jnp.clip(ys, 0.0, h_l[:, None] - 1.0).astype(jnp.int32)
        x_oob = (xs < -1.0) | (xs > w_l[:, None])
        y_oob = (ys < -1.0) | (ys > h_l[:, None])
        idx = (
            base[:, None, None]
            + yi_n[:, :, None] * wi_l[:, None, None]
            + xi_n[:, None, :]
        )
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            r, ph * sr, pw * sr, c
        )
        oob = y_oob[:, :, None] | x_oob[:, None, :]
        vals = jnp.where(oob[..., None], 0.0, vals)
    else:
        raise ValueError(interpolation)

    vals = vals.reshape(r, ph, sr, pw, sr, c)
    return jnp.mean(vals, axis=(2, 4))
