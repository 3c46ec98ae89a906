"""C4 (non-FPN) model family tests.

Covers the reference's resnet_c4 backbone + ResNet_C5_Head /
ResNet_2mlp_Head RoI heads (backbone/ResNet.py:151-301, registered at
:288-320): tiny end-to-end train/eval forwards, and golden activation
parity of the stage-5 stack / 2mlp parts against the reference's own
torch modules with imported weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpm_tpu.config import get_default_cfg
from cpm_tpu.modeling.model import build_model


def _tiny_c4_cfg(head):
    cfg = get_default_cfg()
    cfg.MODEL.FPN_ON = False
    cfg.MODEL.FASTER_RCNN = True
    cfg.MODEL.NUM_CLASSES = 5
    cfg.BACKBONE.CONV_BODY = "resnet_c4"
    cfg.BACKBONE.RESNET.LAYERS = (1, 1, 1, 1)
    cfg.BACKBONE.RESNET.BASE_PLANES = 8
    cfg.FAST_RCNN.ROI_BOX_HEAD = head
    cfg.FAST_RCNN.MLP_HEAD.MLP_DIM = 64
    # single-level RPN on the stride-16 C4 map (Detectron C4 recipe)
    cfg.RPN.ANCHOR_STRIDE = (16,)
    cfg.RPN.ANCHOR_SIZES = (32, 64, 128)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.RPN.FPN_POST_NMS_TOP_N_TRAIN = 64
    cfg.RPN.PRE_NMS_TOP_N_TEST = 32
    cfg.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.RPN.FPN_POST_NMS_TOP_N_TEST = 32
    cfg.FAST_RCNN.BATCH_SIZE_PER_IMAGE = 16
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 10
    if head == "resnet_c5_head":
        cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = (14, 14)
    else:
        # 2mlp head: keep layer4 stride 1 so the pooler scale stays 1/16
        # (ResNet.py:241-242)
        cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = (7, 7)
        cfg.BACKBONE.RESNET.C5_DILATION = 2
    return cfg


def _tiny_batch():
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


@pytest.mark.parametrize("head", ["resnet_c5_head", "resnet_2mlp_head"])
def test_c4_train_and_eval(head):
    images, image_sizes, gt = _tiny_batch()
    cfg = _tiny_c4_cfg(head)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )
    # the C4 trunk has no layer4 params; the head owns its own stage-5
    params = variables["params"]
    assert not any(k.startswith("layer4") for k in params["backbone"])
    assert any(k.startswith("layer4") for k in params["roi_head"]["head"])

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

    def loss_fn(p):
        out = model.apply(
            {"params": p}, images, image_sizes, gt=gt, train=True,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        return sum(out.values())

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaf_norms = [
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
    ]
    assert all(np.isfinite(n) for n in leaf_norms)

    dets = model.apply(variables, images, image_sizes, train=False)
    assert dets.boxes.shape == (2, 10, 4)
    assert bool(jnp.all(jnp.isfinite(dets.boxes)))


# --------------------------------------------------------------------------
# Golden parity vs the reference torch heads
# --------------------------------------------------------------------------

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_heads():
    from tests.ref_oracle import install_reference_stubs

    install_reference_stubs()
    import importlib

    DR = importlib.import_module("pet.rcnn.modeling.backbone.ResNet")
    from pet.rcnn.core.config import cfg as ref_cfg

    torch.manual_seed(0)
    c5 = DR.ResNet_C5_Head([1024], [1 / 16.0])
    prev = ref_cfg.BACKBONE.RESNET.C5_DILATION
    ref_cfg.BACKBONE.RESNET.C5_DILATION = 2
    two_mlp = DR.ResNet_2mlp_Head([1024], [1 / 16.0])
    ref_cfg.BACKBONE.RESNET.C5_DILATION = prev
    rng = np.random.RandomState(0)
    for net in (c5, two_mlp):
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                n = m.num_features
                m.running_mean.copy_(torch.from_numpy(
                    rng.uniform(-0.5, 0.5, n).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, n).astype(np.float32)))
        net.eval()
    return c5, two_mlp


def test_c5_stage_activation_parity(reference_heads):
    """Same pooled input, imported weights -> same stage-5 output."""
    from flax import linen as nn

    from cpm_tpu.modeling.roi_heads.c4_heads import _stage5
    from cpm_tpu.utils.weight_import import import_c5_stage

    c5, _ = reference_heads
    sd = {k: v.detach().numpy() for k, v in c5.state_dict().items()}
    params = import_c5_stage(sd, n_blocks=3)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 1024, 14, 14).astype(np.float32)
    with torch.no_grad():
        want = c5.layer4(torch.from_numpy(x)).numpy()  # [2, 2048, 7, 7]

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, h):
            return _stage5(
                h, n_blocks=3, stride=2, base_planes=64, width=64,
                groups=1, stride_3x3=False, avg_down=False, norm="affine",
                conv="normal", context="none", ctx_ratio=0.0625, dilation=1,
            )

    got = Stage().apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_2mlp_parts_activation_parity(reference_heads):
    """layer4+conv_new on the map, and fc1/fc2 on a pooled feature,
    against the reference ResNet_2mlp_Head with imported weights."""
    from flax import linen as nn

    from cpm_tpu.modeling.roi_heads.c4_heads import _stage5
    from cpm_tpu.utils.weight_import import import_2mlp_head

    _, head = reference_heads
    sd = {k: v.detach().numpy() for k, v in head.state_dict().items()}
    # pool resolution baked into fc1 at construction (the reference cfg's
    # FAST_RCNN.ROI_XFORM_RESOLUTION default)
    ph = int(np.sqrt(sd["fc1.weight"].shape[1] // 256))
    params = import_2mlp_head(sd, n_blocks=3, pool_hw=(ph, ph))

    rng = np.random.RandomState(2)
    x = rng.randn(1, 1024, 18, 24).astype(np.float32)
    pooled = rng.randn(4, 256, ph, ph).astype(np.float32)
    with torch.no_grad():
        y4 = head.layer4(torch.from_numpy(x))
        yc = head.conv_new(y4).numpy()
        z = torch.from_numpy(pooled).view(4, -1)
        z = torch.nn.functional.relu(head.fc1(z))
        want_fc = torch.nn.functional.relu(head.fc2(z)).numpy()

    class Parts(nn.Module):
        @nn.compact
        def __call__(self, h, pool_nhwc):
            y = _stage5(
                h, n_blocks=3, stride=1, base_planes=64, width=64,
                groups=1, stride_3x3=False, avg_down=False, norm="affine",
                conv="normal", context="none", ctx_ratio=0.0625, dilation=2,
            )
            y = nn.relu(nn.Conv(256, (1, 1), name="conv_new")(y))
            zz = pool_nhwc.reshape(pool_nhwc.shape[0], -1)
            zz = nn.relu(nn.Dense(1024, name="fc1")(zz))
            zz = nn.relu(nn.Dense(1024, name="fc2")(zz))
            return y, zz

    got_map, got_fc = Parts().apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(pooled.transpose(0, 2, 3, 1)),
    )
    got_map = np.asarray(got_map).transpose(0, 3, 1, 2)
    assert got_map.shape == yc.shape
    np.testing.assert_allclose(got_map, yc, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_fc), want_fc, rtol=2e-4,
                               atol=2e-4)
