"""Grid R-CNN numerical core: target rasterization and heatmap->box decode.

Reference (all /root/reference/pet/rcnn/modeling/grid_cascade_rcnn/):
  * target rasterization: loss.py:180-257 — a per-roi, per-point, per-pixel
    Python triple loop on CPU producing cruciform discs of radius
    POS_RADIUS at gt grid points inside the mapping-ratio-expanded RoI,
    cropped to per-point half-size sub-regions (calc_sub_regions,
    loss.py:284-313);
  * decode: inference.py:189-279 (get_boxes) — per-point argmax on CPU,
    sub-region offset, mapping-ratio unmap, confidence-weighted border
    voting.

Both are rebuilt as fully vectorized, fixed-shape jnp ops that run on
device inside jit — eliminating the reference's .cpu()/.cuda() round trips
(SURVEY §3.1 hot-loop note). Numerics match the reference exactly,
including the int() truncation of grid-point cell coordinates and the
"skip rois smaller than grid_size" rule.
"""

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def calc_sub_regions(
    grid_points: int, grid_size: int, whole_map_size: int
) -> List[Tuple[int, int, int, int]]:
    """Per-point (x1, y1, x2, y2) crops of the whole heatmap (loss.py:284)."""
    half_size = whole_map_size // 4 * 2
    sub_regions = []
    for i in range(grid_points):
        x_idx = i // grid_size
        y_idx = i % grid_size
        if x_idx == 0:
            sub_x1 = 0
        elif x_idx == grid_size - 1:
            sub_x1 = half_size
        else:
            ratio = x_idx / (grid_size - 1) - 0.25
            sub_x1 = max(int(ratio * whole_map_size), 0)
        if y_idx == 0:
            sub_y1 = 0
        elif y_idx == grid_size - 1:
            sub_y1 = half_size
        else:
            ratio = y_idx / (grid_size - 1) - 0.25
            sub_y1 = max(int(ratio * whole_map_size), 0)
        sub_regions.append((sub_x1, sub_y1, sub_x1 + half_size, sub_y1 + half_size))
    return sub_regions


def _point_factors(grid_points: int, grid_size: int) -> np.ndarray:
    """[P, 2] (factor_x, factor_y) interpolation factors (loss.py:203-209)."""
    f = np.zeros((grid_points, 2), np.float32)
    for j in range(grid_points):
        x_idx = j // grid_size
        y_idx = j % grid_size
        f[j, 0] = 1 - x_idx / (grid_size - 1)
        f[j, 1] = 1 - y_idx / (grid_size - 1)
    return f


def expand_boxes(boxes: jnp.ndarray, mapping_ratio: float) -> jnp.ndarray:
    """CMM expansion: each side grows by mapping_ratio * half-extent
    (loss.py:185-191). mapping_ratio=1 doubles the box."""
    w2 = (boxes[..., 2] - boxes[..., 0]) * 0.5
    h2 = (boxes[..., 3] - boxes[..., 1]) * 0.5
    return jnp.stack(
        [
            boxes[..., 0] - mapping_ratio * w2,
            boxes[..., 1] - mapping_ratio * h2,
            boxes[..., 2] + mapping_ratio * w2,
            boxes[..., 3] + mapping_ratio * h2,
        ],
        axis=-1,
    )


def grid_targets(
    pos_bboxes: jnp.ndarray,
    pos_gt_bboxes: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    mapping_ratio: float = 1.0,
    grid_points: int = 9,
    roi_feat_size: int = 14,
    pos_radius: int = 1,
    target_refine: bool = False,
) -> jnp.ndarray:
    """Vectorized heatmap targets.

    Args:
      pos_bboxes: [N, 4] positive proposals (pre-expansion).
      pos_gt_bboxes: [N, 4] matched gt boxes.
      valid: [N] bool; invalid rois get all-zero targets.
      target_refine: GRID_RCNN.TARGET_REFINE (loss.py:236-249) — when a
        grid point's center falls outside the whole map, additionally mark
        the center clamped into the map (the base rule only marks the
        in-bounds part of the radius disc).

    Returns: [N, P, half, half] float32 targets, P-channel sub-region crops
    (loss.py:196-257). half = roi_feat_size * 2.
    """
    grid_size = int(np.sqrt(grid_points))
    whole = roi_feat_size * 4
    half = whole // 4 * 2
    subs = np.array(
        calc_sub_regions(grid_points, grid_size, whole), np.int32
    )  # [P, 4]
    factors = _point_factors(grid_points, grid_size)  # [P, 2]

    exp = expand_boxes(pos_bboxes, mapping_ratio)  # [N, 4]
    ws = exp[:, 2] - exp[:, 0]
    hs = exp[:, 3] - exp[:, 1]
    # ignore small boxes (loss.py:215-217): comparison on the EXPANDED size
    ok = valid & (ws > grid_size) & (hs > grid_size)

    fx = jnp.asarray(factors[:, 0])[None, :]  # [1, P]
    fy = jnp.asarray(factors[:, 1])[None, :]
    gx = fx * pos_gt_bboxes[:, 0:1] + (1 - fx) * pos_gt_bboxes[:, 2:3]
    gy = fy * pos_gt_bboxes[:, 1:2] + (1 - fy) * pos_gt_bboxes[:, 3:4]
    # int() truncation toward zero (loss.py:227-231)
    safe_w = jnp.maximum(ws, 1e-6)[:, None]
    safe_h = jnp.maximum(hs, 1e-6)[:, None]
    cx = jnp.trunc((gx - exp[:, 0:1]) / safe_w * whole).astype(jnp.int32)
    cy = jnp.trunc((gy - exp[:, 1:2]) / safe_h * whole).astype(jnp.int32)

    # sub-region pixel (y, x) corresponds to whole-map
    # (y + sub_y1[p], x + sub_x1[p])
    yy = jnp.arange(half, dtype=jnp.int32)[None, :, None]  # [1, half, 1]
    xx = jnp.arange(half, dtype=jnp.int32)[None, None, :]  # [1, 1, half]
    sub_x1 = jnp.asarray(subs[:, 0])[:, None, None]  # [P, 1, 1]
    sub_y1 = jnp.asarray(subs[:, 1])[:, None, None]
    map_x = xx + sub_x1  # [P, half, half] (broadcast)
    map_y = yy + sub_y1

    dx = map_x[None] - cx[:, :, None, None]  # [N, P, half, half]
    dy = map_y[None] - cy[:, :, None, None]
    inside = (dx * dx + dy * dy) <= pos_radius * pos_radius
    if target_refine:
        oob = (
            (cx < 0) | (cx >= whole) | (cy < 0) | (cy >= whole)
        )  # [N, P]
        ccx = jnp.clip(cx, 0, whole - 1)[:, :, None, None]
        ccy = jnp.clip(cy, 0, whole - 1)[:, :, None, None]
        at_clamped = (map_x[None] == ccx) & (map_y[None] == ccy)
        inside = inside | (oob[:, :, None, None] & at_clamped)
    tgt = inside & ok[:, None, None, None]
    return tgt.astype(jnp.float32)


def grid_decode(
    proposals: jnp.ndarray,
    heatmaps: jnp.ndarray,
    image_sizes: jnp.ndarray,
    *,
    mapping_ratio: float = 1.0,
    grid_points: int = 9,
    roi_feat_size: int = 14,
    apply_sigmoid: bool = True,
) -> jnp.ndarray:
    """Vectorized get_boxes (inference.py:189-279).

    Args:
      proposals: [N, 4] xyxy.
      heatmaps: [N, P, half, half] logits (or probs if apply_sigmoid=False).
      image_sizes: [N, 2] true (h, w) per roi's image, for the final clamp.

    Returns: [N, 4] refined boxes.
    """
    grid_size = int(np.sqrt(grid_points))
    whole = roi_feat_size * 4
    half = whole // 4 * 2
    subs = np.array(calc_sub_regions(grid_points, grid_size, whole), np.int32)

    hm = jax.nn.sigmoid(heatmaps) if apply_sigmoid else heatmaps
    N, P = hm.shape[:2]
    flat = hm.reshape(N, P, half * half)
    pred_scores = jnp.max(flat, axis=-1)  # [N, P]
    pos = jnp.argmax(flat, axis=-1).astype(jnp.int32)
    xs = (pos % half) + jnp.asarray(subs[:, 0])[None, :]
    ys = (pos // half) + jnp.asarray(subs[:, 1])[None, :]

    widths = (proposals[:, 2] - proposals[:, 0])[:, None]
    heights = (proposals[:, 3] - proposals[:, 1])[:, None]
    x1 = proposals[:, 0, None] - mapping_ratio * (widths / 2)
    y1 = proposals[:, 1, None] - mapping_ratio * (heights / 2)
    abs_xs = (xs.astype(hm.dtype) + 0.5) / (2 * half) * (
        1 + mapping_ratio
    ) * widths + x1
    abs_ys = (ys.astype(hm.dtype) + 0.5) / (2 * half) * (
        1 + mapping_ratio
    ) * heights + y1

    x1_inds = np.arange(grid_size)
    y1_inds = np.arange(grid_size) * grid_size
    x2_inds = grid_points - grid_size + np.arange(grid_size)
    y2_inds = (np.arange(grid_size) + 1) * grid_size - 1

    def vote(coords, scores, inds):
        s = scores[:, inds]
        denom = jnp.maximum(jnp.sum(s, axis=1), 1e-12)
        return jnp.sum(coords[:, inds] * s, axis=1) / denom

    bx1 = vote(abs_xs, pred_scores, x1_inds)
    by1 = vote(abs_ys, pred_scores, y1_inds)
    bx2 = vote(abs_xs, pred_scores, x2_inds)
    by2 = vote(abs_ys, pred_scores, y2_inds)

    h = image_sizes[:, 0].astype(hm.dtype)
    w = image_sizes[:, 1].astype(hm.dtype)
    bx1 = jnp.clip(bx1, 0.0, w - 1)
    bx2 = jnp.clip(bx2, 0.0, w - 1)
    by1 = jnp.clip(by1, 0.0, h - 1)
    by2 = jnp.clip(by2, 0.0, h - 1)
    return jnp.stack([bx1, by1, bx2, by2], axis=-1)


def resize_large_rois(boxes: jnp.ndarray, thresh: float = 96.0**2,
                      delta_ratio: float = 0.7) -> jnp.ndarray:
    """RESIZE_ROI shrink of large boxes (inference.py:15-29)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    large = (w * h) > thresh
    dx = delta_ratio * 0.5 * w
    dy = delta_ratio * 0.5 * h
    shrunk = jnp.stack(
        [
            boxes[..., 0] + dx,
            boxes[..., 1] + dy,
            boxes[..., 2] - dx,
            boxes[..., 3] - dy,
        ],
        axis=-1,
    )
    return jnp.where(large[..., None], shrunk, boxes)


def extend_rois(boxes: jnp.ndarray, image_sizes: jnp.ndarray) -> jnp.ndarray:
    """EXTEND_ROI 2x box growth clamped to image (grid_cascade_rcnn.py:293-309)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    out = jnp.stack(
        [
            boxes[..., 0] - 0.5 * w,
            boxes[..., 1] - 0.5 * h,
            boxes[..., 2] + 0.5 * w,
            boxes[..., 3] + 0.5 * h,
        ],
        axis=-1,
    )
    ih = image_sizes[..., 0:1].astype(boxes.dtype)
    iw = image_sizes[..., 1:2].astype(boxes.dtype)
    return jnp.stack(
        [
            jnp.clip(out[..., 0], 0.0, iw[..., 0]),
            jnp.clip(out[..., 1], 0.0, ih[..., 0]),
            jnp.clip(out[..., 2], 0.0, iw[..., 0]),
            jnp.clip(out[..., 3], 0.0, ih[..., 0]),
        ],
        axis=-1,
    )


def enhance_features(features: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """ENHANCE_FEATURES cross-level mixing (grid_cascade_rcnn.py:268-290).

    out[i] = f[i] + nearest_down(out[i-1]) + nearest_up(f[i+1]); consumes
    all FPN levels (P2..P6), returns the 4 RoI levels (P2..P5). NHWC.
    """
    out: List[jnp.ndarray] = []
    for i, feat in enumerate(features):
        if i > 0:
            h, w = feat.shape[1], feat.shape[2]
            down = jax.image.resize(
                out[i - 1], (feat.shape[0], h, w, feat.shape[3]), "nearest"
            )
            feat = feat + down
        if i < len(features) - 1:
            h, w = feat.shape[1], feat.shape[2]
            up = jax.image.resize(
                features[i + 1], (feat.shape[0], h, w, feat.shape[3]),
                "nearest",
            )
            feat = feat + up
            out.append(feat)
        else:
            break
    return out


def random_jitter_boxes(
    boxes: jnp.ndarray, key, image_sizes: jnp.ndarray, amplitude: float = 0.15
) -> jnp.ndarray:
    """RANDOM_JITTER of proposals (rcnn/utils/misc.py:97-120)."""
    off = jax.random.uniform(
        key, boxes.shape[:-1] + (4,), minval=-amplitude, maxval=amplitude
    )
    cx = (boxes[..., 0] + boxes[..., 2]) / 2
    cy = (boxes[..., 1] + boxes[..., 3]) / 2
    w = jnp.abs(boxes[..., 2] - boxes[..., 0])
    h = jnp.abs(boxes[..., 3] - boxes[..., 1])
    ncx = cx + w * off[..., 0]
    ncy = cy + h * off[..., 1]
    nw = w * (1 + off[..., 2])
    nh = h * (1 + off[..., 3])
    ih = image_sizes[..., 0:1].astype(boxes.dtype)
    iw = image_sizes[..., 1:2].astype(boxes.dtype)
    x1 = jnp.clip(ncx - nw / 2, 0.0, iw[..., 0] - 1)
    y1 = jnp.clip(ncy - nh / 2, 0.0, ih[..., 0] - 1)
    x2 = jnp.clip(ncx + nw / 2, 0.0, iw[..., 0] - 1)
    y2 = jnp.clip(ncy + nh / 2, 0.0, ih[..., 0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def better_roi_mask(
    boxes: jnp.ndarray, gt_boxes: jnp.ndarray, ratio: float = 0.25
) -> jnp.ndarray:
    """BETTER_ROI center-distance filter (loss.py:311-328). Returns bool mask."""
    cxy = lambda b: (
        (b[..., 0] + b[..., 2]) * 0.5,
        (b[..., 1] + b[..., 3]) * 0.5,
    )
    bx, by = cxy(boxes)
    gx, gy = cxy(gt_boxes)
    dist = (gx - bx) ** 2 + (gy - by) ** 2
    max_dist = (ratio * (gt_boxes[..., 2] - gt_boxes[..., 0])) ** 2 + (
        ratio * (gt_boxes[..., 3] - gt_boxes[..., 1])
    ) ** 2
    return (max_dist - dist) >= 0
