"""RoIPool, point sampling, ml_soft_nms, box_ml_voting tests."""

import numpy as np
import jax.numpy as jnp

from cpm_tpu.ops.roi_pool import pool_points_interp, roi_pool
from cpm_tpu.ops.nms import box_ml_voting, ml_soft_nms


def test_roi_pool_max_semantics():
    # features with a known max in each region
    f = np.zeros((1, 8, 8, 1), np.float32)
    f[0, 1, 1, 0] = 5.0
    f[0, 6, 6, 0] = 7.0
    rois = jnp.array([[0, 0, 0, 7, 7]], jnp.float32)  # whole map
    out = roi_pool(jnp.asarray(f), rois, (2, 2), 1.0)
    got = np.asarray(out[0, :, :, 0])
    assert got[0, 0] == 5.0
    assert got[1, 1] == 7.0
    assert got[0, 1] == 0.0  # empty-max region contains only zeros


def test_roi_pool_matches_bruteforce():
    rng = np.random.RandomState(0)
    f = rng.randn(2, 10, 12, 3).astype(np.float32)
    rois = np.array(
        [[0, 4, 4, 36, 28], [1, 0, 0, 44, 36]], np.float32
    )
    out = np.asarray(roi_pool(jnp.asarray(f), jnp.asarray(rois), (2, 2), 0.25))
    for r, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = [int(round(v * 0.25)) for v in roi[1:]]
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        for py in range(2):
            for px in range(2):
                hs = int(np.floor(py * rh / 2)) + y1
                he = int(np.ceil((py + 1) * rh / 2)) + y1
                ws = int(np.floor(px * rw / 2)) + x1
                we = int(np.ceil((px + 1) * rw / 2)) + x1
                hs, he = max(hs, 0), min(he, 10)
                ws, we = max(ws, 0), min(we, 12)
                region = f[b, hs:he, ws:we]
                want = region.max(axis=(0, 1)) if region.size else 0.0
                np.testing.assert_allclose(
                    out[r, py, px], want, atol=1e-5
                )


def test_pool_points_interp_center_exact():
    f = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    pts = jnp.array([[0, 2, 1], [0, 0, 0]], jnp.float32)
    out = np.asarray(pool_points_interp(jnp.asarray(f), pts, 1.0))
    assert out[0, 0] == f[0, 1, 2, 0]
    assert out[1, 0] == f[0, 0, 0, 0]


def test_pool_points_interp_bilinear_midpoint():
    f = np.zeros((1, 2, 2, 1), np.float32)
    f[0] = np.array([[1, 3], [5, 7]], np.float32)[..., None]
    pts = jnp.array([[0, 0.5, 0.5]], jnp.float32)
    out = np.asarray(pool_points_interp(jnp.asarray(f), pts, 1.0))
    np.testing.assert_allclose(out[0, 0], 4.0)


def test_ml_soft_nms_respects_labels():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]], jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    labels = jnp.array([1, 1, 2])
    idx, new_scores, valid = ml_soft_nms(
        boxes, scores, labels, 3, method="hard", overlap_thresh=0.5
    )
    # the label-2 duplicate box must keep its score (no cross-label decay)
    kept = {int(i): float(s) for i, s, v in zip(idx, new_scores, valid) if v}
    assert 2 in kept and abs(kept[2] - 0.7) < 1e-6
    assert 1 not in kept  # same-label overlap suppressed by hard method


def test_box_ml_voting_same_label_only():
    # standard (no +1) IoU, as the reference's devIoU computes it
    # (box_ml_voting.cu:14-26): IoU([0,0,10,10],[1,1,11,11]) = 81/119
    top = jnp.array([[0, 0, 10, 10]], jnp.float32)
    pool = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [1, 1, 11, 11]], jnp.float32
    )
    pool_scores = jnp.array([1.0, 1.0, 1.0])
    tl = jnp.array([1])
    pl = jnp.array([1, 1, 2])  # third box has another label
    voted, scores = box_ml_voting(
        top, jnp.array([0.9]), tl, pool, pool_scores, pl, thresh=0.5
    )
    # average of the two label-1 boxes only
    np.testing.assert_allclose(
        np.asarray(voted[0]), [0.5, 0.5, 10.5, 10.5], atol=1e-5
    )
