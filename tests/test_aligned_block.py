"""AlignedBottleneck (BACKBONE.*.USE_ALIGN) activation parity vs the
reference's own torch blocks (pet/models/imagenet/resnet.py:139-217,
resnext.py:88-170), with BN running stats folded into the frozen-affine
convention (cpm_tpu/modeling/norm.py docstring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpm_tpu.modeling.backbone.resnet import AlignedBottleneck
from tests.ref_oracle import install_reference_stubs


def _t2j(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _aff(bn, rng):
    """Randomize a torch BN's params + running stats, return the folded
    (scale, bias) AffineChannel params."""
    import torch

    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, bn.weight.shape[0]).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.randn(bn.bias.shape[0]).astype(np.float32) * 0.1))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(bn.running_mean.shape[0]).astype(np.float32) * 0.1))
        bn.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, bn.running_var.shape[0]).astype(np.float32)))
    g = bn.weight.detach().numpy()
    b = bn.bias.detach().numpy()
    m = bn.running_mean.numpy()
    v = bn.running_var.numpy()
    scale = g / np.sqrt(v + bn.eps)
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(b - m * scale)}


def _params_from_torch(ref, rng, downsample):
    p = {
        "conv1_1": {"kernel": _t2j(ref.conv1_1.weight)},
        "AffineChannel_0": _aff(ref.bn1_1, rng),
        "conv1_2": {"kernel": _t2j(ref.conv1_2.weight)},
        "conv2_1": {"kernel": _t2j(ref.conv2_1.weight)},
        "AffineChannel_1": _aff(ref.bn2_1, rng),
        "conv2_2": {"kernel": _t2j(ref.conv2_2.weight)},
        "AffineChannel_2": _aff(ref.bn2_2, rng),
        "conv2_3": {"kernel": _t2j(ref.conv2_3.weight)},
        "AffineChannel_3": _aff(ref.bn_concat, rng),
        "conv": {"kernel": _t2j(ref.conv.weight)},
        "AffineChannel_4": _aff(ref.bn, rng),
    }
    if downsample:
        p["downsample_conv"] = {"kernel": _t2j(ref.downsample[0].weight)}
        p["AffineChannel_5"] = _aff(ref.downsample[1], rng)
    return p


@pytest.mark.parametrize("stride", [1, 2])
def test_aligned_bottleneck_resnet_oracle(stride):
    install_reference_stubs()
    import torch
    import torch.nn as nn

    from pet.models.imagenet import resnet as res

    inplanes, planes = 32, 16
    downsample = nn.Sequential(
        nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
        nn.BatchNorm2d(planes * 4),
    )
    torch.manual_seed(stride)
    ref = res.AlignedBottleneck(
        inplanes, planes, base_width=64, stride=stride, norm="bn",
        downsample=downsample,
    ).eval()

    rng = np.random.RandomState(stride)
    ours = AlignedBottleneck(planes=planes, stride=stride, downsample=True)
    x = rng.randn(2, inplanes, 14, 14).astype(np.float32)
    feats = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init = ours.init(jax.random.PRNGKey(0), feats)["params"]
    params = _params_from_torch(ref, rng, downsample=True)
    assert set(init) == set(params), (set(init), set(params))

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.transpose(
        np.asarray(ours.apply({"params": params}, feats)), (0, 3, 1, 2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_aligned_bottleneck_resnext_oracle():
    install_reference_stubs()
    import torch

    from pet.models.imagenet import resnext as resx

    planes, C, bw = 16, 8, 4
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ours = AlignedBottleneck(
        planes=planes, base_width=bw, groups=C, stride=1,
        downsample=False,
    )
    # residual add requires matching dims: inplanes == planes*4 for the
    # no-downsample case
    inplanes = planes * 4
    ref2 = resx.AlignedBottleneck(
        inplanes, planes, base_width=bw, cardinality=C, stride=1,
        norm="bn", downsample=None,
    ).eval()
    x = rng.randn(2, inplanes, 10, 10).astype(np.float32)
    feats = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init = ours.init(jax.random.PRNGKey(0), feats)["params"]
    params = _params_from_torch(ref2, rng, downsample=False)
    assert set(init) == set(params)

    with torch.no_grad():
        want = ref2(torch.from_numpy(x)).numpy()
    got = np.transpose(
        np.asarray(ours.apply({"params": params}, feats)), (0, 3, 1, 2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_use_align_builder():
    """BACKBONE.RESNET.USE_ALIGN builds an aligned trunk end to end."""
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling import registry

    cfg = get_default_cfg()
    r = cfg.BACKBONE.RESNET
    r.USE_ALIGN = True
    r.LAYERS = (1, 1, 1, 1)
    r.BASE_PLANES = 8
    body = registry.BACKBONES["resnet"](cfg)
    x = jnp.zeros((1, 64, 64, 3))
    feats = body.apply(body.init(jax.random.PRNGKey(0), x), x)
    assert [f.shape[-1] for f in feats] == [32, 64, 128, 256]
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
