"""Cascade R-CNN end-to-end smoke tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.config import get_default_cfg
from cpm_tpu.modeling.model import build_model


def _cascade_cfg(num_stage=2, iou_helper=False, rescore=False):
    cfg = get_default_cfg()
    cfg.MODEL.FPN_ON = True
    cfg.MODEL.FASTER_RCNN = True
    cfg.MODEL.CASCADE_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.NUM_CLASSES = 5
    cfg.BACKBONE.RESNET.LAYERS = (1, 1, 1, 1)
    cfg.BACKBONE.RESNET.BASE_PLANES = 8
    cfg.FPN.DIM = 32
    cfg.FAST_RCNN.MLP_HEAD.MLP_DIM = 64
    cfg.GRID_RCNN.MLP_HEAD.MLP_DIM = 64
    cfg.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.RPN.FPN_POST_NMS_TOP_N_TRAIN = 48
    cfg.RPN.PRE_NMS_TOP_N_TEST = 32
    cfg.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.RPN.FPN_POST_NMS_TOP_N_TEST = 24
    cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = (7, 7)
    cfg.FAST_RCNN.BATCH_SIZE_PER_IMAGE = 16
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 10
    cc = cfg.CASCADE_RCNN
    cc.NUM_STAGE = num_stage
    cc.TEST_STAGE = num_stage
    cc.IOU_HELPER = iou_helper
    cc.IOU_HELPER_MERGE = iou_helper
    cc.RESCORE_ON = rescore
    cfg.GRID_RCNN.BATCH_SIZE_PER_IMAGE = 16
    return cfg


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    image_sizes = jnp.array([[64, 64], [56, 48]])
    gt = dict(
        boxes=jnp.array(
            [
                [[4, 4, 34, 34], [10, 12, 44, 44]],
                [[8, 8, 30, 30], [0, 0, 0, 0]],
            ],
            jnp.float32,
        ),
        labels=jnp.array([[1, 3], [2, 0]], jnp.int32),
        mask=jnp.array([[True, True], [True, False]]),
    )
    return images, image_sizes, gt


def test_cascade_train_and_eval(batch):
    images, image_sizes, gt = batch
    cfg = _cascade_cfg(num_stage=2, iou_helper=True, rescore=True)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )
    losses = model.apply(
        variables, images, image_sizes, gt=gt, train=True,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    expect = {
        "loss_objectness", "loss_rpn_box_reg",
        "s1_cls_loss", "s1_bbox_loss", "s2_cls_loss", "s2_bbox_loss",
        "loss_iou_2", "loss_rescore",
    }
    assert set(losses) == expect, set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    dets = model.apply(variables, images, image_sizes, train=False)
    assert dets.boxes.shape == (2, 10, 4)
    lv = np.asarray(dets.labels)[np.asarray(dets.mask)]
    if len(lv):
        assert ((lv >= 1) & (lv < 5)).all()


def test_cascade_grads_flow_to_all_stages(batch):
    images, image_sizes, gt = batch
    cfg = _cascade_cfg(num_stage=2)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )

    def loss_fn(params):
        out = model.apply(
            {"params": params}, images, image_sizes, gt=gt, train=True,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        return sum(out.values())

    _, grads = jax.value_and_grad(loss_fn)(variables["params"])
    for s in range(2):
        g = grads["roi_head"][f"box_head_{s}"]
        total = sum(
            float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g)
        )
        assert total > 0, f"stage {s} got no gradient"
