"""RPN tests: anchor numerics vs the published Detectron table, proposal
selection shapes/masking, loss finiteness and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.modeling.rpn import (
    AnchorLayout,
    RPNHead,
    generate_cell_anchors,
    grid_anchors,
    rpn_losses,
    select_proposals,
)


def test_cell_anchors_match_detectron_table():
    # The reference's generate_anchors output for stride 16 /
    # sizes (128, 256, 512) / ratios (0.5, 1, 2): the matlab table in
    # anchor_generator.py:193-218 shifted by -1 (matlab is 1-indexed,
    # the python base anchor is [0, 0, 15, 15]).
    expected = np.array(
        [
            [-84, -40, 99, 55],
            [-176, -88, 191, 103],
            [-360, -184, 375, 199],
            [-56, -56, 71, 71],
            [-120, -120, 135, 135],
            [-248, -248, 263, 263],
            [-36, -80, 51, 95],
            [-80, -168, 95, 183],
            [-168, -344, 183, 359],
        ],
        dtype=np.float32,
    )
    got = generate_cell_anchors(16, (128, 256, 512), (0.5, 1.0, 2.0))
    np.testing.assert_array_equal(got, expected)


def test_grid_anchor_order_hwa():
    cell = generate_cell_anchors(4, (32,), (1.0,))
    a = grid_anchors(cell, 2, 3, 4)
    assert a.shape == (6, 4)
    # second anchor should be shifted by stride in x (w fastest after a)
    np.testing.assert_allclose(a[1] - a[0], [4, 0, 4, 0])
    np.testing.assert_allclose(a[3] - a[0], [0, 4, 0, 4])


def _tiny_setup():
    feat_shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    strides = (4, 8, 16, 32, 64)
    sizes = (32, 64, 128, 256, 512)
    layout = AnchorLayout(feat_shapes, strides, sizes, (0.5, 1.0, 2.0))
    B = 2
    key = jax.random.PRNGKey(0)
    objectness = [
        jax.random.normal(jax.random.fold_in(key, i), (B, h, w, 3))
        for i, (h, w) in enumerate(feat_shapes)
    ]
    box_reg = [
        0.1 * jax.random.normal(jax.random.fold_in(key, 10 + i), (B, h, w, 12))
        for i, (h, w) in enumerate(feat_shapes)
    ]
    image_sizes = jnp.array([[64, 64], [60, 50]])
    return layout, objectness, box_reg, image_sizes


def test_select_proposals_shapes_and_bounds():
    layout, objectness, box_reg, image_sizes = _tiny_setup()
    boxes, scores, valid = select_proposals(
        layout,
        objectness,
        box_reg,
        image_sizes,
        pre_nms_top_n=100,
        post_nms_top_n=50,
        nms_thresh=0.7,
        min_size=0,
        fpn_post_nms_top_n=80,
        fpn_post_nms_per_batch=True,
        is_train=False,
    )
    assert boxes.shape == (2, 80, 4)
    assert scores.shape == (2, 80)
    assert valid.shape == (2, 80)
    assert bool(jnp.any(valid))
    # valid boxes are clipped to their true image
    b1 = np.asarray(boxes[1][np.asarray(valid[1])])
    assert (b1[:, 2] <= 49.0 + 1e-4).all()
    assert (b1[:, 3] <= 59.0 + 1e-4).all()


def test_select_proposals_train_appends_gt():
    layout, objectness, box_reg, image_sizes = _tiny_setup()
    gt = jnp.array(
        [[[2, 2, 30, 30], [5, 5, 20, 40]], [[1, 1, 10, 10], [0, 0, 0, 0]]],
        jnp.float32,
    )
    gt_mask = jnp.array([[True, True], [True, False]])
    boxes, scores, valid = select_proposals(
        layout,
        objectness,
        box_reg,
        image_sizes,
        pre_nms_top_n=100,
        post_nms_top_n=50,
        nms_thresh=0.7,
        min_size=0,
        fpn_post_nms_top_n=80,
        fpn_post_nms_per_batch=True,
        is_train=True,
        gt_boxes=gt,
        gt_mask=gt_mask,
    )
    assert boxes.shape == (2, 82, 4)
    np.testing.assert_allclose(boxes[0, -2:], gt[0])
    assert bool(valid[0, -1]) and not bool(valid[1, -1])


def test_rpn_losses_finite_and_differentiable():
    layout, objectness, box_reg, image_sizes = _tiny_setup()
    gt = jnp.array(
        [[[2, 2, 30, 30], [5, 5, 20, 40]], [[1, 1, 40, 40], [0, 0, 0, 0]]],
        jnp.float32,
    )
    gt_mask = jnp.array([[True, True], [True, False]])

    def loss_fn(scale):
        obj = [o * scale for o in objectness]
        lo, lb = rpn_losses(
            layout, obj, box_reg, image_sizes, gt, gt_mask,
            jax.random.PRNGKey(1),
        )
        return lo + lb

    val, grad = jax.value_and_grad(loss_fn)(1.0)
    assert np.isfinite(float(val))
    assert np.isfinite(float(grad))


def test_rpn_head_shared_weights():
    head = RPNHead(num_anchors=3)
    feats = [jnp.zeros((1, 8, 8, 256)), jnp.zeros((1, 4, 4, 256))]
    params = head.init(jax.random.PRNGKey(0), feats)
    logits, reg = head.apply(params, feats)
    assert logits[0].shape == (1, 8, 8, 3) and reg[1].shape == (1, 4, 4, 12)
    # single shared conv param set
    assert set(params["params"].keys()) == {"conv", "cls_logits", "bbox_pred"}


def test_cell_anchors_match_reference_torch():
    """generate_cell_anchors vs the reference's generate_anchors
    (rpn/anchor_generator.py:221-291, Detectron rounding numerics)."""
    import importlib
    import sys

    import pytest

    pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    AG = importlib.import_module("pet.rcnn.modeling.rpn.anchor_generator")

    # the reference uses the np.float alias removed in numpy>=1.24
    had = hasattr(np, "float")
    if not had:
        np.float = float
    try:
        for stride, sizes in ((16, (32, 64, 128, 256, 512)), (4, (32,)),
                              (64, (512,))):
            for ratios in ((0.5, 1.0, 2.0), (0.25, 0.5, 1.0, 2.0, 4.0)):
                want = AG.generate_anchors(stride, sizes, ratios).numpy()
                got = generate_cell_anchors(stride, sizes, ratios)
                np.testing.assert_allclose(
                    got, want, atol=1e-4,
                    err_msg=f"stride={stride} sizes={sizes} ratios={ratios}",
                )
    finally:
        if not had:
            del np.float
