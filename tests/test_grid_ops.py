"""Grid target rasterization + decode vs a naive-loop oracle implementing
the reference semantics (grid_cascade_rcnn/loss.py:180-257,
inference.py:189-279)."""

import numpy as np
import jax.numpy as jnp

from cpm_tpu.modeling.roi_heads.grid_ops import (
    calc_sub_regions,
    expand_boxes,
    extend_rois,
    grid_decode,
    grid_targets,
    resize_large_rois,
)


def oracle_targets(pos_bboxes, pos_gt, mapping_ratio, grid_points,
                   roi_feat_size, pos_radius):
    grid_size = int(np.sqrt(grid_points))
    map_size = roi_feat_size * 4
    # expand
    x1 = pos_bboxes[:, 0] - mapping_ratio * ((pos_bboxes[:, 2] - pos_bboxes[:, 0]) / 2)
    y1 = pos_bboxes[:, 1] - mapping_ratio * ((pos_bboxes[:, 3] - pos_bboxes[:, 1]) / 2)
    x2 = pos_bboxes[:, 2] + mapping_ratio * ((pos_bboxes[:, 2] - pos_bboxes[:, 0]) / 2)
    y2 = pos_bboxes[:, 3] + mapping_ratio * ((pos_bboxes[:, 3] - pos_bboxes[:, 1]) / 2)
    pb = np.stack([x1, y1, x2, y2], axis=-1)
    ws = (pb[:, 2] - pb[:, 0])[:, None]
    hs = (pb[:, 3] - pb[:, 1])[:, None]
    n = pb.shape[0]
    targets = np.zeros((n, grid_points, map_size, map_size), np.float32)
    factors = []
    for j in range(grid_points):
        x_idx = j // grid_size
        y_idx = j % grid_size
        factors.append((1 - x_idx / (grid_size - 1), 1 - y_idx / (grid_size - 1)))
    r2 = pos_radius**2
    for i in range(n):
        if ws[i] <= grid_size or hs[i] <= grid_size:
            continue
        for j in range(grid_points):
            fx, fy = factors[j]
            gx = fx * pos_gt[i, 0] + (1 - fx) * pos_gt[i, 2]
            gy = fy * pos_gt[i, 1] + (1 - fy) * pos_gt[i, 3]
            cx = int((gx - pb[i, 0]) / ws[i] * map_size)
            cy = int((gy - pb[i, 1]) / hs[i] * map_size)
            for x in range(cx - pos_radius, cx + pos_radius + 1):
                for y in range(cy - pos_radius, cy + pos_radius + 1):
                    if 0 <= x < map_size and 0 <= y < map_size:
                        if (x - cx) ** 2 + (y - cy) ** 2 <= r2:
                            targets[i, j, y, x] = 1
    subs = calc_sub_regions(grid_points, grid_size, map_size)
    out = []
    for j in range(grid_points):
        sx1, sy1, sx2, sy2 = subs[j]
        out.append(targets[:, [j], sy1:sy2, sx1:sx2])
    return np.concatenate(out, axis=1)


def oracle_decode(det, grid_pred_sig, img_hw, mapping_ratio, grid_points,
                  roi_feat_size):
    grid_size = int(np.sqrt(grid_points))
    whole = roi_feat_size * 4
    half = whole // 4 * 2
    subs = calc_sub_regions(grid_points, grid_size, whole)
    R = det.shape[0]
    flat = grid_pred_sig.reshape(R * grid_points, half * half)
    scores = flat.max(axis=1)
    pos = flat.argmax(axis=1)
    xs = pos % half
    ys = pos // half
    for i in range(grid_points):
        xs[i::grid_points] += subs[i][0]
        ys[i::grid_points] += subs[i][1]
    scores = scores.reshape(R, grid_points)
    xs = xs.reshape(R, grid_points)
    ys = ys.reshape(R, grid_points)
    widths = (det[:, 2] - det[:, 0])[:, None]
    heights = (det[:, 3] - det[:, 1])[:, None]
    x1 = det[:, 0, None] - mapping_ratio * (widths / 2)
    y1 = det[:, 1, None] - mapping_ratio * (heights / 2)
    abs_xs = (xs + 0.5) / (2 * half) * (1 + mapping_ratio) * widths + x1
    abs_ys = (ys + 0.5) / (2 * half) * (1 + mapping_ratio) * heights + y1
    x1i = list(range(grid_size))
    y1i = [i * grid_size for i in range(grid_size)]
    x2i = [grid_points - grid_size + i for i in range(grid_size)]
    y2i = [(i + 1) * grid_size - 1 for i in range(grid_size)]
    v = lambda c, idx: (c[:, idx] * scores[:, idx]).sum(1) / scores[:, idx].sum(1)
    res = np.stack(
        [v(abs_xs, x1i), v(abs_ys, y1i), v(abs_xs, x2i), v(abs_ys, y2i)],
        axis=1,
    )
    h, w = img_hw
    res[:, [0, 2]] = res[:, [0, 2]].clip(0, w - 1)
    res[:, [1, 3]] = res[:, [1, 3]].clip(0, h - 1)
    return res


def test_sub_regions_9pt_56():
    subs = calc_sub_regions(9, 3, 56)
    assert subs[0] == (0, 0, 28, 28)
    assert subs[8] == (28, 28, 56, 56)
    assert subs[4] == (14, 14, 42, 42)  # center point
    assert all(s[2] - s[0] == 28 and s[3] - s[1] == 28 for s in subs)


def test_grid_targets_match_oracle():
    rng = np.random.RandomState(3)
    n = 12
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 60, n)
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(2, 60, n), y1 + rng.uniform(2, 60, n)], 1
    ).astype(np.float32)
    # gt boxes overlapping-ish
    gt = boxes + rng.uniform(-4, 4, (n, 4)).astype(np.float32)
    gt[:, 2] = np.maximum(gt[:, 2], gt[:, 0] + 1)
    gt[:, 3] = np.maximum(gt[:, 3], gt[:, 1] + 1)
    for ratio in (1.0, 0.5, 0.25):
        want = oracle_targets(boxes, gt, ratio, 9, 14, 1)
        got = grid_targets(
            jnp.asarray(boxes), jnp.asarray(gt), jnp.ones(n, bool),
            mapping_ratio=ratio, grid_points=9, roi_feat_size=14,
            pos_radius=1,
        )
        np.testing.assert_array_equal(np.asarray(got), want)


def test_grid_targets_invalid_rois_zero():
    boxes = np.array([[0, 0, 40, 40]], np.float32)
    gt = np.array([[2, 2, 38, 38]], np.float32)
    got = grid_targets(
        jnp.asarray(boxes), jnp.asarray(gt), jnp.zeros(1, bool)
    )
    assert float(np.asarray(got).sum()) == 0.0


def test_grid_decode_matches_oracle():
    rng = np.random.RandomState(7)
    n = 8
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 200, n)
    det = np.stack(
        [x1, y1, x1 + rng.uniform(8, 120, n), y1 + rng.uniform(8, 120, n)], 1
    ).astype(np.float32)
    logits = rng.randn(n, 9, 28, 28).astype(np.float32) * 3
    sig = 1 / (1 + np.exp(-logits))
    for ratio in (1.0, 0.5):
        want = oracle_decode(det, sig, (480, 640), ratio, 9, 14)
        got = grid_decode(
            jnp.asarray(det),
            jnp.asarray(logits),
            jnp.broadcast_to(jnp.array([480, 640]), (n, 2)),
            mapping_ratio=ratio,
            grid_points=9,
            roi_feat_size=14,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)


def test_resize_large_rois():
    boxes = jnp.array(
        [[0, 0, 10, 10], [0, 0, 200, 200]], jnp.float32
    )
    out = np.asarray(resize_large_rois(boxes))
    np.testing.assert_allclose(out[0], [0, 0, 10, 10])  # small unchanged
    np.testing.assert_allclose(out[1], [70, 70, 130, 130])  # shrunk 0.7


def test_expand_boxes_ratio1_doubles():
    b = jnp.array([[10, 10, 30, 30]], jnp.float32)
    out = np.asarray(expand_boxes(b, 1.0))
    np.testing.assert_allclose(out[0], [0, 0, 40, 40])


def _install_ref_stubs():
    from ref_oracle import install_reference_stubs

    install_reference_stubs()


def test_grid_targets_match_reference_torch_rasterizer():
    """Drive the REFERENCE's own GridLossComputation.prepare_target
    (the CPU triple-loop rasterizer, grid_cascade_rcnn/loss.py:178-257)
    and assert our vectorized grid_targets is bit-identical."""
    import importlib

    import pytest

    torch = pytest.importorskip("torch")
    _install_ref_stubs()

    RL = importlib.import_module("pet.rcnn.modeling.grid_cascade_rcnn.loss")
    CFG = importlib.import_module("pet.rcnn.core.config")

    rng = np.random.RandomState(11)
    N = 24
    # boxes in a 300x400 image, some tiny (exercise the small-box skip),
    # some whose gt grid points land outside the expanded roi
    x1 = rng.rand(N) * 300
    y1 = rng.rand(N) * 220
    w = np.where(rng.rand(N) < 0.2, rng.rand(N) * 3,
                 8 + rng.rand(N) * 120)
    h = np.where(rng.rand(N) < 0.2, rng.rand(N) * 3,
                 8 + rng.rand(N) * 90)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
    jit = (rng.rand(N, 4) - 0.5) * 30
    gt = (boxes + jit).astype(np.float32)
    gt[:, 2] = np.maximum(gt[:, 2], gt[:, 0] + 1)
    gt[:, 3] = np.maximum(gt[:, 3], gt[:, 1] + 1)

    for stage, ratio in ((0, 1.0), (1, 0.5)):
        saved = (
            CFG.cfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_MAPPING_RATIO,
            CFG.cfg.GRID_RCNN.TARGET_REFINE,
        )
        CFG.cfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_MAPPING_RATIO = (
            (1.0, 0.5, 0.25)
        )
        CFG.cfg.GRID_RCNN.TARGET_REFINE = False
        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            obj = RL.GridLossComputation.__new__(RL.GridLossComputation)
            obj.stage = stage
            obj.grid_points = 9
            obj.grid_size = 3
            obj.roi_feat_size = 14
            obj.whole_map_size = 56
            obj.pos_radius = 1
            obj.sub_regions = RL.calc_sub_regions(9, 3, 56)
            obj.pos_result = (
                torch.from_numpy(boxes), torch.from_numpy(gt)
            )
            want = obj.prepare_target(None, None).numpy()
        finally:
            torch.Tensor.cuda = orig_cuda
            (
                CFG.cfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_MAPPING_RATIO,
                CFG.cfg.GRID_RCNN.TARGET_REFINE,
            ) = saved

        got = np.asarray(grid_targets(
            jnp.asarray(boxes), jnp.asarray(gt),
            jnp.ones(N, bool), mapping_ratio=ratio,
            grid_points=9, roi_feat_size=14, pos_radius=1,
        ))
        np.testing.assert_array_equal(got, want, err_msg=f"stage {stage}")


def test_grid_decode_matches_reference_torch_get_boxes():
    """Drive the REFERENCE's own GridPostProcessor.get_boxes (the CPU
    heatmap->box decode, grid_cascade_rcnn/inference.py:189-279) and
    assert our vectorized grid_decode matches."""
    import importlib

    import pytest

    torch = pytest.importorskip("torch")
    _install_ref_stubs()

    RI = importlib.import_module(
        "pet.rcnn.modeling.grid_cascade_rcnn.inference"
    )
    CFG = importlib.import_module("pet.rcnn.core.config")
    BB = importlib.import_module(
        "pet.utils.data.structures.bounding_box"
    )

    rng = np.random.RandomState(13)
    N = 32
    img_hw = (480, 640)
    x1 = rng.rand(N) * 500
    y1 = rng.rand(N) * 360
    w = 8 + rng.rand(N) * 120
    h = 8 + rng.rand(N) * 90
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
    # modest magnitude: large logits saturate sigmoid to identical f32
    # values and the argmax tie then breaks on torch-vs-jax ulp noise
    logits = rng.randn(N, 9, 28, 28).astype(np.float32) * 0.5

    for stage, ratio in ((0, 1.0), (2, 0.25)):
        saved = (
            CFG.cfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_MAPPING_RATIO,
            CFG.cfg.GRID_RCNN.EXTEND_ROI,
        )
        CFG.cfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_MAPPING_RATIO = (
            (1.0, 0.5, 0.25)
        )
        CFG.cfg.GRID_RCNN.EXTEND_ROI = False
        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            obj = RI.GridPostProcessor.__new__(RI.GridPostProcessor)
            obj.stage = stage
            obj.grid_points = 9
            obj.grid_size = 3
            obj.whole_map_size = 56
            obj.sub_regions = RI.calc_sub_regions(9, 3, 56)
            proposals = BB.BoxList(
                torch.from_numpy(boxes), (img_hw[1], img_hw[0]), mode="xyxy"
            )
            want = obj.get_boxes(
                proposals, torch.from_numpy(logits), is_train=False
            ).numpy()
        finally:
            torch.Tensor.cuda = orig_cuda
            (
                CFG.cfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_MAPPING_RATIO,
                CFG.cfg.GRID_RCNN.EXTEND_ROI,
            ) = saved

        # the reference's final clamp is a silent no-op: advanced indexing
        # (`bbox_res[:, [0, 2]].clamp_(...)`, inference.py:275-276)
        # clamps a COPY, so its boxes can leave the image. We implement
        # the evident intent (clamp); apply it to the oracle output here.
        want[:, 0::2] = want[:, 0::2].clip(0, img_hw[1] - 1)
        want[:, 1::2] = want[:, 1::2].clip(0, img_hw[0] - 1)

        sizes = np.tile(np.array([img_hw], np.int32), (N, 1))
        got = np.asarray(grid_decode(
            jnp.asarray(boxes), jnp.asarray(logits), jnp.asarray(sizes),
            mapping_ratio=ratio, grid_points=9, roi_feat_size=14,
        ))
        np.testing.assert_allclose(
            got, want, atol=1e-3, rtol=1e-5, err_msg=f"stage {stage}"
        )


def test_extend_rois_matches_reference_torch():
    """EXTEND_ROI 2x growth + image clamp vs the reference's extend()
    (grid_cascade_rcnn.py:293-309)."""
    import importlib

    import pytest

    torch = pytest.importorskip("torch")
    _install_ref_stubs()
    GC = importlib.import_module(
        "pet.rcnn.modeling.grid_cascade_rcnn.grid_cascade_rcnn"
    )
    BB = importlib.import_module("pet.utils.data.structures.bounding_box")

    rng = np.random.RandomState(17)
    N = 40
    img_hw = (300, 420)
    x1 = rng.rand(N) * 380
    y1 = rng.rand(N) * 260
    boxes = np.stack([
        x1, y1, x1 + rng.rand(N) * 120, y1 + rng.rand(N) * 90
    ], 1).astype(np.float32)
    bl = BB.BoxList(torch.from_numpy(boxes.copy()),
                    (img_hw[1], img_hw[0]), mode="xyxy")
    want = GC.extend([bl])[0].bbox.numpy()
    got = np.asarray(extend_rois(
        jnp.asarray(boxes), jnp.asarray([[img_hw[0], img_hw[1]]], np.int32)
    ))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_large_rois_reference_bug_documented():
    """The reference's resize_boxes (inference.py:15-29) shrinks ALL
    boxes: `_bbox = bbox` aliases, the in-place ops mutate every row, and
    the final `bbox[l_ind] = _bbox[l_ind]` is a no-op. Assert that the
    bug is real (so this documented deviation stays honest), and that our
    resize_large_rois implements the evident intent: shrink only boxes
    with area > 96^2."""
    import importlib

    import pytest

    torch = pytest.importorskip("torch")
    _install_ref_stubs()
    RI = importlib.import_module(
        "pet.rcnn.modeling.grid_cascade_rcnn.inference"
    )

    small = np.array([[0, 0, 10, 10]], np.float32)       # area 100 << 96^2
    large = np.array([[0, 0, 200, 200]], np.float32)
    both = np.concatenate([small, large])
    ref_out = RI.resize_boxes(torch.from_numpy(both.copy())).numpy()
    # reference shrinks the SMALL box too (the bug)
    assert not np.allclose(ref_out[0], small[0])
    # on large boxes (the intended subset) we match the reference exactly
    ours = np.asarray(resize_large_rois(jnp.asarray(both)))
    np.testing.assert_allclose(ours[1], ref_out[1], atol=1e-5)
    # and we leave small boxes alone (the intent)
    np.testing.assert_allclose(ours[0], small[0])
