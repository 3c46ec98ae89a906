"""End-to-end Fast R-CNN model smoke tests (tiny shapes, CPU jax)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.config import get_default_cfg
from cpm_tpu.modeling.model import build_model


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.FPN_ON = True
    cfg.MODEL.FASTER_RCNN = True
    cfg.MODEL.NUM_CLASSES = 5
    cfg.BACKBONE.RESNET.LAYERS = (1, 1, 1, 1)
    cfg.BACKBONE.RESNET.BASE_PLANES = 8
    cfg.FPN.DIM = 32
    cfg.FAST_RCNN.MLP_HEAD.MLP_DIM = 64
    cfg.GRID_RCNN.MLP_HEAD.MLP_DIM = 64
    cfg.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.RPN.FPN_POST_NMS_TOP_N_TRAIN = 64
    cfg.RPN.PRE_NMS_TOP_N_TEST = 32
    cfg.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = (7, 7)
    cfg.FAST_RCNN.BATCH_SIZE_PER_IMAGE = 16
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 10
    return cfg


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    image_sizes = jnp.array([[64, 64], [56, 48]])
    gt = dict(
        boxes=jnp.array(
            [
                [[4, 4, 30, 30], [10, 12, 40, 44], [0, 0, 0, 0]],
                [[8, 8, 24, 24], [0, 0, 0, 0], [0, 0, 0, 0]],
            ],
            jnp.float32,
        ),
        labels=jnp.array([[1, 3, 0], [2, 0, 0]], jnp.int32),
        mask=jnp.array([[True, True, False], [True, False, False]]),
    )
    return images, image_sizes, gt


def test_train_forward_losses(tiny_cfg, tiny_batch):
    images, image_sizes, gt = tiny_batch
    model = build_model(tiny_cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )
    losses = model.apply(
        variables, images, image_sizes, gt=gt, train=True,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    assert set(losses) == {
        "loss_objectness", "loss_rpn_box_reg",
        "loss_classifier", "loss_box_reg",
    }
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_train_backward_grads(tiny_cfg, tiny_batch):
    images, image_sizes, gt = tiny_batch
    model = build_model(tiny_cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )

    def loss_fn(params):
        losses = model.apply(
            {"params": params}, images, image_sizes, gt=gt, train=True,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        return sum(losses.values())

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # at least some backbone gradient is nonzero
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_eval_forward_detections(tiny_cfg, tiny_batch):
    images, image_sizes, gt = tiny_batch
    model = build_model(tiny_cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )
    dets = model.apply(variables, images, image_sizes, train=False)
    assert dets.boxes.shape == (2, 10, 4)
    assert dets.scores.shape == (2, 10)
    assert dets.labels.shape == (2, 10)
    # labels of valid detections are foreground classes
    lv = np.asarray(dets.labels)[np.asarray(dets.mask)]
    assert ((lv >= 1) & (lv < 5)).all()


def test_uint8_device_normalize_matches_f32(tiny_cfg, tiny_batch):
    """A raw uint8 batch (device-side normalization) must produce the same
    detections as the equivalent host-normalized f32 batch."""
    import copy

    from cpm_tpu.data.transforms import normalize_image

    _, image_sizes, gt = tiny_batch
    rng = np.random.RandomState(7)
    raw = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)  # RGB

    # f32 compute: the f32 reference path below bypasses the engine's
    # bf16 cast, while _normalize_uint8 lands in the compute dtype — a
    # dtype mismatch would dominate the comparison
    c = copy.deepcopy(tiny_cfg)
    c.TPU.COMPUTE_DTYPE = "float32"
    # host path: normalize exactly like the loaders do
    f32 = np.stack([
        normalize_image(
            raw[i], tuple(c.PIXEL_MEANS), tuple(c.PIXEL_STDS),
            bool(c.TO_BGR255),
        )
        for i in range(2)
    ])
    # device path: uint8 in model channel order (BGR when TO_BGR255)
    u8 = raw[..., ::-1] if c.TO_BGR255 else raw

    model = build_model(c)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(f32), image_sizes, gt=gt, train=True,
    )
    d_f32 = model.apply(variables, jnp.asarray(f32), image_sizes, train=False)
    d_u8 = model.apply(
        variables, jnp.asarray(np.ascontiguousarray(u8)), image_sizes,
        train=False,
    )
    np.testing.assert_array_equal(
        np.asarray(d_f32.mask), np.asarray(d_u8.mask)
    )
    np.testing.assert_allclose(
        np.asarray(d_f32.boxes), np.asarray(d_u8.boxes), atol=1e-2, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d_f32.scores), np.asarray(d_u8.scores), atol=1e-4
    )


def test_eval_pooler_f32_knob(tiny_cfg, tiny_batch):
    """TPU.EVAL_POOLER_DTYPE=float32 evals cleanly and resets the
    trace-time flag; with f32 compute it is a value no-op."""
    import copy

    from cpm_tpu.ops import pooler as P

    cfg = copy.deepcopy(tiny_cfg)
    cfg.TPU.EVAL_POOLER_DTYPE = "float32"
    images, image_sizes, gt = tiny_batch
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )
    dets = model.apply(variables, images, image_sizes, train=False)
    assert P._FORCE_F32.get() is False  # flag restored after the trace
    assert bool(jnp.isfinite(dets.scores).all())
    base = build_model(tiny_cfg).apply(
        variables, images, image_sizes, train=False
    )
    np.testing.assert_allclose(
        np.asarray(dets.boxes), np.asarray(base.boxes), atol=1e-5
    )
    # train path still runs with the flag off throughout
    losses = model.apply(
        variables, images, image_sizes, gt=gt, train=True,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    assert P._FORCE_F32.get() is False
    assert all(bool(jnp.isfinite(v)) for v in losses.values())
