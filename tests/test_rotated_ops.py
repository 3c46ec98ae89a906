"""Rotated-box op tests vs analytic / Monte-Carlo grid oracles."""

import numpy as np
import jax.numpy as jnp

from cpm_tpu.ops.rotated import (
    box_iou_rotated,
    nms_rotated,
    poly_iou,
    poly_nms,
    roi_align_rotated,
    rotated_box_corners,
)
from cpm_tpu.ops.roi_align import roi_align


def grid_iou(b1, b2, res=400, extent=60):
    """Dense-grid IoU oracle for rotated boxes (cx,cy,w,h,deg)."""
    xs = np.linspace(0, extent, res)
    ys = np.linspace(0, extent, res)
    X, Y = np.meshgrid(xs, ys)

    def inside(b):
        cx, cy, w, h, a = b
        th = np.deg2rad(a)
        dx = X - cx
        dy = Y - cy
        lx = dx * np.cos(th) + dy * np.sin(th)
        ly = -dx * np.sin(th) + dy * np.cos(th)
        return (np.abs(lx) <= w / 2) & (np.abs(ly) <= h / 2)

    m1 = inside(b1)
    m2 = inside(b2)
    inter = (m1 & m2).sum()
    union = (m1 | m2).sum()
    return inter / max(union, 1)


def test_identical_boxes_iou_one():
    b = jnp.array([[20, 20, 10, 6, 30]], jnp.float32)
    iou = box_iou_rotated(b, b)
    np.testing.assert_allclose(np.asarray(iou), [[1.0]], atol=1e-5)


def test_axis_aligned_matches_simple():
    b1 = jnp.array([[20, 20, 10, 10, 0]], jnp.float32)
    b2 = jnp.array([[25, 20, 10, 10, 0]], jnp.float32)
    # inter = 5*10=50, union=150
    iou = box_iou_rotated(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), [[50 / 150]], atol=1e-5)


def test_rotated_iou_matches_grid_oracle():
    rng = np.random.RandomState(0)
    boxes1 = np.stack(
        [
            rng.uniform(20, 40, 5),
            rng.uniform(20, 40, 5),
            rng.uniform(6, 20, 5),
            rng.uniform(6, 20, 5),
            rng.uniform(-90, 90, 5),
        ],
        axis=1,
    ).astype(np.float32)
    boxes2 = np.stack(
        [
            rng.uniform(20, 40, 4),
            rng.uniform(20, 40, 4),
            rng.uniform(6, 20, 4),
            rng.uniform(6, 20, 4),
            rng.uniform(-90, 90, 4),
        ],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(box_iou_rotated(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    for i in range(5):
        for j in range(4):
            want = grid_iou(boxes1[i], boxes2[j])
            assert abs(got[i, j] - want) < 0.02, (i, j, got[i, j], want)


def test_nms_rotated_suppresses_overlaps():
    boxes = jnp.array(
        [
            [20, 20, 10, 6, 30],
            [20.5, 20, 10, 6, 32],  # heavy overlap with first
            [45, 45, 8, 8, 0],
        ],
        jnp.float32,
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, keep = nms_rotated(boxes, scores, 0.5, 3)
    kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
    assert kept == {0, 2}


def test_poly_iou_square():
    q1 = jnp.array([[0, 0, 10, 0, 10, 10, 0, 10]], jnp.float32)
    q2 = jnp.array([[5, 0, 15, 0, 15, 10, 5, 10]], jnp.float32)
    iou = poly_iou(q1, q2)
    np.testing.assert_allclose(np.asarray(iou), [[50 / 150]], atol=1e-5)
    idx, keep = poly_nms(
        jnp.concatenate([q1, q2]), jnp.array([0.9, 0.8]), 0.2, 2
    )
    assert np.asarray(keep).sum() == 1


def test_roi_align_rotated_zero_angle_matches_axis_aligned():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    # axis-aligned rois via both APIs (rotated uses center format)
    rois_xyxy = jnp.array([[0, 8, 8, 40, 24]], jnp.float32)
    cx, cy = (8 + 40) / 2, (8 + 24) / 2
    rois_rot = jnp.array([[0, cx, cy, 32, 16, 0]], jnp.float32)
    a = roi_align(feats, rois_xyxy, (7, 7), 0.25, 2)
    b = roi_align_rotated(feats, rois_rot, (7, 7), 0.25, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_corners_shape_and_area():
    b = jnp.array([[10, 10, 8, 4, 45]], jnp.float32)
    c = rotated_box_corners(b)
    assert c.shape == (1, 4, 2)
    # rotated rectangle keeps its area (shoelace)
    x, y = np.asarray(c[0, :, 0]), np.asarray(c[0, :, 1])
    area = 0.5 * abs(
        sum(
            x[i] * y[(i + 1) % 4] - x[(i + 1) % 4] * y[i]
            for i in range(4)
        )
    )
    np.testing.assert_allclose(area, 32.0, rtol=1e-5)
