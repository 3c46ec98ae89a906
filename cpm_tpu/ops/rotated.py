"""Rotated-box ops: IoU, NMS, RoIAlign for (cx, cy, w, h, angle) boxes.

Replaces the reference CUDA/C++ kernels:
  * box_iou_rotated (csrc/Box_ops/box_iou_rotated_cuda.cu +
    box_iou_rotated_utils.h — polygon-clipping intersection);
  * nms_rotated (csrc/NMS/nms_rotated_cuda.cu);
  * ROIAlignRotated (csrc/ROIAlign/ROIAlignRotated_cuda.cu) — RoIAlign with
    a rotated sampling grid;
  * poly_nms (csrc/NMS/poly_nms.cu) — NMS over free quadrilaterals.

TPU-native formulation: the pairwise rotated intersection is computed with
a fully vectorized Sutherland–Hodgman clip (one rectangle clipped against
the 4 half-planes of the other; vertex buffers padded to a static 8 slots),
so the whole [N, M] IoU matrix is one fused elementwise program — no
sequential geometry loops.

Angle convention follows the reference: degrees, counter-clockwise
positive (box_iou_rotated_utils.h uses radians internally).
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cpm_tpu.ops.nms import _sorted_keep_mask


def rotated_box_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] (cx, cy, w, h, angle_deg) -> [..., 4, 2] corners (ccw)."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    theta = a * (math.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    dx = w / 2.0
    dy = h / 2.0
    # local corners (ccw): (+dx,+dy), (-dx,+dy), (-dx,-dy), (+dx,-dy)
    lx = jnp.stack([dx, -dx, -dx, dx], axis=-1)
    ly = jnp.stack([dy, dy, -dy, -dy], axis=-1)
    # rotate: y axis points down in image coords; reference rotates
    # (x cos - y sin, x sin + y cos)
    px = cx[..., None] + lx * cos[..., None] - ly * sin[..., None]
    py = cy[..., None] + lx * sin[..., None] + ly * cos[..., None]
    return jnp.stack([px, py], axis=-1)


def polygon_area(pts: jnp.ndarray, valid: jnp.ndarray = None) -> jnp.ndarray:
    """Shoelace area of padded polygons.

    pts: [..., V, 2] with the first `n` valid vertices in cyclic order and
    every padding slot REPLICATING the last valid vertex (the clip below
    maintains this). Under that invariant the unmasked shoelace sum is
    exact: duplicated-vertex edges contribute zero and the final
    pad->first edge is the true closing edge. `valid` is accepted for API
    symmetry but unused.
    """
    x = pts[..., 0]
    y = pts[..., 1]
    x2 = jnp.roll(x, -1, axis=-1)
    y2 = jnp.roll(y, -1, axis=-1)
    cross = x * y2 - x2 * y
    return 0.5 * jnp.abs(jnp.sum(cross, axis=-1))


def _clip_by_halfplane(pts, count, a, b, c):
    """Clip padded convex polygons by a*x + b*y + c >= 0.

    pts: [..., V, 2]; count: [...] int valid-vertex count (vertices stored
    cyclically in the first `count` slots; padding slots replicate the last
    valid vertex). a/b/c broadcast to the batch shape. Returns
    (clipped pts, new counts) with the same static V and the same padding
    invariant.
    """
    V = pts.shape[-2]
    batch_shape = pts.shape[:-2]
    P = pts.reshape((-1, V, 2))
    n = count.reshape((-1,))
    A = jnp.broadcast_to(a, batch_shape).reshape((-1,))
    Bc = jnp.broadcast_to(b, batch_shape).reshape((-1,))
    Cc = jnp.broadcast_to(c, batch_shape).reshape((-1,))

    def one(pts, cnt, a, b, c):
        d = a * pts[:, 0] + b * pts[:, 1] + c  # [V]
        inside = d >= 0
        slot = jnp.arange(V)
        nxt = jnp.where(slot + 1 >= cnt, 0, slot + 1)
        p_j = pts[nxt]
        d_j = d[nxt]
        in_j = inside[nxt]
        active = slot < cnt

        denom = d - d_j
        t = d / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        inter = pts + (p_j - pts) * t[:, None]

        emit_v = inside & active
        emit_x = (inside ^ in_j) & active
        n_emit = emit_v.astype(jnp.int32) + emit_x.astype(jnp.int32)
        start = jnp.cumsum(n_emit) - n_emit
        pos_v = jnp.where(emit_v, start, V)
        pos_x = jnp.where(emit_x, start + emit_v.astype(jnp.int32), V)
        new_cnt = jnp.sum(n_emit)

        out = jnp.zeros((V + 1, 2), pts.dtype)
        out = out.at[pos_v].set(pts, mode="drop")
        out = out.at[pos_x].set(inter, mode="drop")
        out = out[:V]
        # replicate last valid vertex into padding slots
        last = out[jnp.maximum(new_cnt - 1, 0)]
        pad = slot >= new_cnt
        out = jnp.where(pad[:, None], last[None, :], out)
        return out, new_cnt

    P2, n2 = jax.vmap(one)(P, n, A, Bc, Cc)
    return P2.reshape(pts.shape), n2.reshape(count.shape)


def rotated_pair_intersection_area(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Pairwise intersection areas of rotated boxes.

    boxes1: [N, 5]; boxes2: [M, 5] -> [N, M].
    """
    N = boxes1.shape[0]
    M = boxes2.shape[0]
    c1 = rotated_box_corners(boxes1)  # [N, 4, 2]
    c2 = rotated_box_corners(boxes2)  # [M, 4, 2]

    V = 8  # max vertices after clipping a quad by a quad
    pts = jnp.broadcast_to(c1[:, None], (N, M, 4, 2))
    pts = jnp.concatenate(
        [pts, jnp.repeat(pts[..., 3:4, :], V - 4, axis=-2)], axis=-2
    )  # pad to V with last vertex
    count = jnp.full((N, M), 4, jnp.int32)

    # half-planes of boxes2: edge (k -> k+1), inward normal
    for k in range(4):
        p = c2[:, k]          # [M, 2]
        q = c2[:, (k + 1) % 4]
        ex = q[:, 0] - p[:, 0]
        ey = q[:, 1] - p[:, 1]
        # inward normal for ccw polygon in image coords: (-ey, ex) needs the
        # polygon's orientation; determine sign from the polygon center
        a = -ey
        b = ex
        c = -(a * p[:, 0] + b * p[:, 1])
        center = jnp.mean(c2, axis=1)  # [M, 2]
        s = a * center[:, 0] + b * center[:, 1] + c
        sgn = jnp.where(s >= 0, 1.0, -1.0)
        a, b, c = a * sgn, b * sgn, c * sgn
        A = jnp.broadcast_to(a[None, :], (N, M))
        B = jnp.broadcast_to(b[None, :], (N, M))
        C = jnp.broadcast_to(c[None, :], (N, M))
        pts, count = _clip_by_halfplane(pts, count, A, B, C)

    valid = jnp.arange(V)[None, None, :] < count[..., None]
    area = polygon_area(pts, valid)
    return jnp.where(count >= 3, area, 0.0)


def box_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[N, 5] x [M, 5] -> [N, M] IoU (box_iou_rotated_cuda.cu)."""
    inter = rotated_pair_intersection_area(boxes1, boxes2)
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_rotated(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    mask: Optional[jnp.ndarray] = None,
):
    """Greedy NMS over rotated boxes (csrc/NMS/nms_rotated_cuda.cu).

    Returns (indices [max_output], keep [max_output]) like ops.nms.
    """
    n = boxes.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    neg_inf = jnp.finfo(scores.dtype).min
    s = jnp.where(mask, scores, neg_inf)
    order = jnp.argsort(-s)
    b_sorted = boxes[order]
    valid_sorted = mask[order]
    iou = box_iou_rotated(b_sorted, b_sorted)
    keep_sorted = _sorted_keep_mask(iou, valid_sorted, iou_threshold)
    kept_rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
    slot = jnp.where(keep_sorted, kept_rank, max_output)
    out_idx = jnp.zeros((max_output + 1,), jnp.int32)
    out_valid = jnp.zeros((max_output + 1,), bool)
    out_idx = out_idx.at[slot].set(order.astype(jnp.int32), mode="drop")
    out_valid = out_valid.at[slot].set(keep_sorted, mode="drop")
    return out_idx[:max_output], out_valid[:max_output]


def quad_area(quads: jnp.ndarray) -> jnp.ndarray:
    """[..., 8] (x1 y1 ... x4 y4) -> area via shoelace."""
    pts = quads.reshape(quads.shape[:-1] + (4, 2))
    v = jnp.ones(pts.shape[:-1], bool)
    return polygon_area(pts, v)


def poly_iou(quads1: jnp.ndarray, quads2: jnp.ndarray) -> jnp.ndarray:
    """IoU between convex quadrilaterals [N, 8] x [M, 8] (poly_nms.cu)."""
    # represent each quad by clipping quad1 against quad2's half-planes
    N, M = quads1.shape[0], quads2.shape[0]
    c1 = quads1.reshape(N, 4, 2)
    c2 = quads2.reshape(M, 4, 2)
    V = 8
    pts = jnp.broadcast_to(c1[:, None], (N, M, 4, 2))
    pts = jnp.concatenate(
        [pts, jnp.repeat(pts[..., 3:4, :], V - 4, axis=-2)], axis=-2
    )
    count = jnp.full((N, M), 4, jnp.int32)
    for k in range(4):
        p = c2[:, k]
        q = c2[:, (k + 1) % 4]
        a = -(q[:, 1] - p[:, 1])
        b = q[:, 0] - p[:, 0]
        c = -(a * p[:, 0] + b * p[:, 1])
        center = jnp.mean(c2, axis=1)
        s = a * center[:, 0] + b * center[:, 1] + c
        sgn = jnp.where(s >= 0, 1.0, -1.0)
        a, b, c = a * sgn, b * sgn, c * sgn
        pts, count = _clip_by_halfplane(
            pts, count,
            jnp.broadcast_to(a[None], (N, M)),
            jnp.broadcast_to(b[None], (N, M)),
            jnp.broadcast_to(c[None], (N, M)),
        )
    valid = jnp.arange(V)[None, None, :] < count[..., None]
    inter = jnp.where(count >= 3, polygon_area(pts, valid), 0.0)
    a1 = quad_area(quads1)
    a2 = quad_area(quads2)
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def poly_nms(
    quads: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    mask: Optional[jnp.ndarray] = None,
):
    """NMS over quadrilaterals (csrc/NMS/poly_nms.cu)."""
    n = quads.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    neg_inf = jnp.finfo(scores.dtype).min
    s = jnp.where(mask, scores, neg_inf)
    order = jnp.argsort(-s)
    q_sorted = quads[order]
    valid_sorted = mask[order]
    iou = poly_iou(q_sorted, q_sorted)
    keep_sorted = _sorted_keep_mask(iou, valid_sorted, iou_threshold)
    kept_rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
    slot = jnp.where(keep_sorted, kept_rank, max_output)
    out_idx = jnp.zeros((max_output + 1,), jnp.int32)
    out_valid = jnp.zeros((max_output + 1,), bool)
    out_idx = out_idx.at[slot].set(order.astype(jnp.int32), mode="drop")
    out_valid = out_valid.at[slot].set(keep_sorted, mode="drop")
    return out_idx[:max_output], out_valid[:max_output]


def roi_align_rotated(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float,
    sampling_ratio: int = 0,
) -> jnp.ndarray:
    """RoIAlign over rotated rois (ROIAlignRotated_cuda.cu).

    rois: [R, 6] (batch_idx, cx, cy, w, h, angle_deg). The sampling grid is
    the axis-aligned RoIAlign grid rotated by angle around the roi center.
    """
    ph, pw = output_size
    sr = sampling_ratio if sampling_ratio > 0 else 2
    B, H, W, C = features.shape
    R = rois.shape[0]

    batch_idx = rois[:, 0].astype(jnp.int32)
    cx = rois[:, 1] * spatial_scale
    cy = rois[:, 2] * spatial_scale
    rw = jnp.maximum(rois[:, 3] * spatial_scale, 1.0)
    rh = jnp.maximum(rois[:, 4] * spatial_scale, 1.0)
    theta = rois[:, 5] * (math.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    bin_w = rw / pw
    bin_h = rh / ph
    ix = (jnp.arange(pw * sr) + 0.5) / sr  # [pw*sr]
    iy = (jnp.arange(ph * sr) + 0.5) / sr
    # local coords relative to center
    lx = ix[None, :] * bin_w[:, None] - rw[:, None] / 2  # [R, pw*sr]
    ly = iy[None, :] * bin_h[:, None] - rh[:, None] / 2  # [R, ph*sr]
    # rotate into image coords
    xs = (
        cx[:, None, None]
        + lx[:, None, :] * cos[:, None, None]
        - ly[:, :, None] * sin[:, None, None]
    )  # [R, ph*sr, pw*sr]
    ys = (
        cy[:, None, None]
        + lx[:, None, :] * sin[:, None, None]
        + ly[:, :, None] * cos[:, None, None]
    )

    oob = (xs < -1.0) | (xs > W) | (ys < -1.0) | (ys > H)
    xc = jnp.clip(xs, 0.0, W - 1.0)
    yc = jnp.clip(ys, 0.0, H - 1.0)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    x1 = jnp.minimum(x0 + 1, W - 1.0)
    y1 = jnp.minimum(y0 + 1, H - 1.0)
    wx1 = xc - x0
    wx0 = 1.0 - wx1
    wy1 = yc - y0
    wy0 = 1.0 - wy1

    flat = features.reshape(B * H * W, C)
    base = (batch_idx * H * W)[:, None, None]

    def g(yi, xi):
        idx = base + yi.astype(jnp.int32) * W + xi.astype(jnp.int32)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            R, ph * sr, pw * sr, C
        )

    vals = (
        g(y0, x0) * (wy0 * wx0)[..., None]
        + g(y0, x1) * (wy0 * wx1)[..., None]
        + g(y1, x0) * (wy1 * wx0)[..., None]
        + g(y1, x1) * (wy1 * wx1)[..., None]
    )
    vals = jnp.where(oob[..., None], 0.0, vals)
    vals = vals.reshape(R, ph, sr, pw, sr, C)
    return jnp.mean(vals, axis=(2, 4))
