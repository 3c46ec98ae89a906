"""Fresh-init scheme tests (cpm_tpu/modeling/initializers.py).

MODEL.INIT_SCHEME='reference' must reproduce the torch reference's
actual from-scratch distributions (analytic moments below are derived
from the cited reference init calls); 'tpu' keeps the round-1 flax
defaults. See the initializers module docstring for the per-site map.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.modeling import initializers as init_scheme
from cpm_tpu.modeling.backbone.resnet import Bottleneck
from cpm_tpu.modeling.fpn import FPN
from cpm_tpu.modeling.norm import AffineChannel
from cpm_tpu.modeling.roi_heads.grid_modules import (
    GridOutput,
    TransitionConv,
)


@pytest.fixture(autouse=True)
def _restore_scheme():
    prev = init_scheme.get_scheme()
    yield
    init_scheme.set_scheme(prev)


def _leaves(params, prefix=""):
    out = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_leaves(v, name + "/"))
        else:
            out[name] = np.asarray(v)
    return out


def test_invalid_scheme_rejected():
    with pytest.raises(ValueError):
        init_scheme.set_scheme("caffe")


def test_backbone_conv_kaiming_fan_out():
    # kaiming_normal(fan_out, relu) (pet/models/imagenet/resnet.py:281):
    # std = sqrt(2 / (kh*kw*cout))
    init_scheme.set_scheme("reference")
    blk = Bottleneck(planes=64, norm="affine")
    p = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 256)))
    leaves = _leaves(p["params"])
    k = leaves["conv2/kernel"]  # (3,3,64,64)
    expect = math.sqrt(2.0 / (9 * k.shape[-1]))
    assert abs(k.std() / expect - 1.0) < 0.08
    # normal, not uniform: max well beyond the uniform bound sqrt(3)*std
    assert abs(k).max() > 2.0 * expect


def test_affine_scale_is_ones_both_schemes():
    # the reference's effective from-scratch affine after its BN fold
    # (train_net.py:109-110) is unit scale; ones under both schemes
    for scheme in ("reference", "tpu"):
        init_scheme.set_scheme(scheme)
        aff = AffineChannel(8)
        p = aff.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
        np.testing.assert_array_equal(
            np.asarray(p["params"]["scale"]), np.ones(8, np.float32)
        )


def test_fpn_conv_kaiming_uniform_a1():
    # kaiming_uniform(a=1) (fpn/FPN.py:86): U(+-sqrt(3/fan_in)),
    # std = sqrt(1/fan_in)
    init_scheme.set_scheme("reference")
    fpn = FPN(fpn_dim=64)
    feats = [
        jnp.zeros((1, 32, 32, 32)),
        jnp.zeros((1, 16, 16, 64)),
        jnp.zeros((1, 8, 8, 128)),
        jnp.zeros((1, 4, 4, 256)),
    ]
    p = fpn.init(jax.random.PRNGKey(0), feats)
    leaves = _leaves(p["params"])
    k = leaves["p5_in/kernel"]  # (1,1,256,64)
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    bound = math.sqrt(3.0 / fan_in)
    assert abs(k).max() <= bound + 1e-7
    assert abs(k.std() / math.sqrt(1.0 / fan_in) - 1.0) < 0.1


def test_transition_conv_torch_defaults():
    # raw nn.Conv2d (grid_heads.py:108-119): kaiming_uniform(a=sqrt(5))
    # -> U(+-sqrt(1/fan_in)); depthwise fan_in = 25, pointwise = c.
    # bias: U(+-1/sqrt(fan_in)), nonzero almost surely.
    init_scheme.set_scheme("reference")
    tc = TransitionConv(16)
    p = tc.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 7, 16)))
    leaves = _leaves(p["params"])
    dw = leaves["dw/kernel"]  # (5,5,1,16)
    assert abs(dw).max() <= math.sqrt(1.0 / 25) + 1e-7
    assert abs(dw.std() / math.sqrt(1.0 / 75) - 1.0) < 0.15
    dwb = leaves["dw/bias"]
    assert np.all(dwb != 0.0) and abs(dwb).max() <= 1.0 / 5 + 1e-7
    pw = leaves["pw/kernel"]  # (1,1,16,16)
    assert abs(pw).max() <= math.sqrt(1.0 / 16) + 1e-7

    init_scheme.set_scheme("tpu")
    p = tc.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 7, 16)))
    assert np.all(_leaves(p["params"])["dw/bias"] == 0.0)


def test_grid_deconv_schemes():
    P, c = 9, 8
    out = GridOutput(grid_points=P, point_feat_channels=c)
    x = jnp.zeros((2, 7, 7, P * c))

    # reference: torch ConvTranspose2d defaults over the transpose fan
    # (outputs.py:24-37 raw modules; grid_heads.py:121-129 is dead code)
    init_scheme.set_scheme("reference")
    p = _leaves(out.init(jax.random.PRNGKey(0), x, x)["params"])
    d1 = p["deconv1_kernel"]  # (4,4,c,cP): fan = (cP/P)*16 = c*16
    bound1 = math.sqrt(1.0 / (c * 16))
    assert abs(d1).max() <= bound1 + 1e-7
    assert abs(d1.std() / (bound1 / math.sqrt(3)) - 1.0) < 0.1
    d2 = p["deconv2_kernel"]  # (4,4,c,P): fan = (P/P)*16 = 16
    assert abs(d2).max() <= math.sqrt(1.0 / 16) + 1e-7
    b2 = p["deconv2_bias"]
    assert np.all(b2 != 0.0) and abs(b2).max() <= 0.25 + 1e-7
    assert b2.dtype == np.float32

    # tpu: the intended-but-dead prior init
    init_scheme.set_scheme("tpu")
    p = _leaves(out.init(jax.random.PRNGKey(0), x, x)["params"])
    np.testing.assert_allclose(
        p["deconv2_bias"], -np.log(0.99 / 0.01), rtol=1e-6
    )
    assert np.all(p["deconv1_bias"] == 0.0)
    assert abs(p["deconv1_kernel"].std() / 0.001 - 1.0) < 0.1


def test_build_model_sets_scheme_from_cfg():
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling.model import build_model

    cfg = get_default_cfg()
    cfg.MODEL.NUM_CLASSES = 9
    cfg.MODEL.INIT_SCHEME = "tpu"
    build_model(cfg)
    assert init_scheme.get_scheme() == "tpu"
    cfg.MODEL.INIT_SCHEME = "reference"
    build_model(cfg)
    assert init_scheme.get_scheme() == "reference"
