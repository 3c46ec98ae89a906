"""Weight-init schemes for from-scratch training.

Two schemes, selected by ``cfg.MODEL.INIT_SCHEME`` (build_model sets the
active scheme before tracing):

``reference``
    Reproduces the torch reference's ACTUAL from-scratch weight
    distributions, which are a mix of explicit rules and silent reliance
    on torch module defaults:

    * backbone convs: kaiming_normal(mode=fan_out, relu)
      (pet/models/imagenet/resnet.py:281);
    * frozen-BN affine scales: effectively ONES — BN is folded into a
      frozen affine at train start (train_net.py:109-110,
      net.py:98-130), and a from-scratch BN folds to scale
      1/sqrt(1+eps); see affine_scale() for why AffineChannel2d's
      U[0,1) self-init (affine.py:12) never survives;
    * FPN convs and every make_fc MLP layer: kaiming_uniform(a=1)
      = U(+-sqrt(3/fan_in)) (fpn/FPN.py:86, pet/utils/net.py:64-72);
    * xconv1fc head convs and the grid OFFSET conv (make_conv):
      kaiming_normal(fan_out, relu) (pet/utils/net.py:31-32);
    * grid tower convs, 5x5-depthwise/1x1 transition convs
      (grid_heads.py:46-52,108-119 build raw nn.Conv2d — make_conv is
      imported but unused there) and grid grouped deconvs: torch
      DEFAULTS — the
      reference's grid_heads.init_weights (grid_heads.py:121-129, incl.
      the -log(0.99/0.01) bias) is DEAD CODE: it is never called, and
      calling it would NameError on the unimported ``kaiming_init``.
      torch's default is kaiming_uniform(a=sqrt(5)) over the transpose
      fan (out_channels * kh * kw) for the weight and
      U(+-1/sqrt(out_channels*kh*kw)) for the bias;
    * raw nn.Conv2d/nn.Linear with no explicit init (e.g. the grid
      OFFSET branch): torch defaults, kaiming_uniform(a=sqrt(5)).

``tpu``
    The flax-native defaults this framework used through round 1
    (lecun_normal convs/dense; grid deconvs normal(0.001) with the
    -log(0.99/0.01) prior bias — i.e. the reference's *intended* but
    dead init). Kept selectable for A/B because the prior-bias deconv
    init is arguably better than what the reference actually runs.

Only fresh ``model.init`` draws are affected; imported checkpoints
overwrite everything. The active scheme is module-level state read at
trace time, so set it (via build_model / set_scheme) before ``init``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_SCHEME = "reference"
_VALID = ("reference", "tpu")


def set_scheme(scheme: str):
    global _SCHEME
    if scheme not in _VALID:
        raise ValueError(
            f"MODEL.INIT_SCHEME must be one of {_VALID}, got {scheme!r}"
        )
    _SCHEME = scheme


def get_scheme() -> str:
    return _SCHEME


def _kaiming_normal_fan_out():
    # torch kaiming_normal_(mode='fan_out', nonlinearity='relu'):
    # untruncated N(0, 2/fan_out)
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _kaiming_uniform_a1():
    # torch kaiming_uniform_(a=1): U(+-sqrt(3/fan_in)), variance 1/fan_in
    return nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def _torch_default_conv():
    # torch Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) ->
    # U(+-sqrt(1/fan_in)), variance 1/(3*fan_in)
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_default_bias(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )
    return init


def backbone_conv():
    """Stem/block convs of ResNet/ResNeXt (+ C5 RoI heads)."""
    if _SCHEME == "reference":
        return _kaiming_normal_fan_out()
    return nn.linear.default_kernel_init  # lecun_normal


def fpn_conv():
    """FPN lateral/posthoc convs (FPN.py:86 kaiming_uniform a=1)."""
    if _SCHEME == "reference":
        return _kaiming_uniform_a1()
    return nn.linear.default_kernel_init


def mlp_fc():
    """make_fc MLP layers: fc6/fc7 of box/cls heads (net.py:64-72)."""
    if _SCHEME == "reference":
        return _kaiming_uniform_a1()
    return nn.linear.default_kernel_init


def tower_conv():
    """make_conv sites: xconv1fc head convs, grid OFFSET conv
    (net.py:31-32 kaiming_normal fan_out; bias 0)."""
    if _SCHEME == "reference":
        return _kaiming_normal_fan_out()
    return nn.linear.default_kernel_init


def torch_conv_kernel():
    """Raw torch nn.Conv2d/nn.Linear default weight init.

    kaiming_uniform(a=sqrt(5)) = U(+-sqrt(1/fan_in)). The flax HWIO
    kernel's fan_in (kh*kw*cin/groups) equals torch's dim1*rf fan for
    grouped convs too, so plain variance_scaling works for the grid
    towers AND the 5x5 depthwise transitions.
    """
    if _SCHEME == "reference":
        return _torch_default_conv()
    return nn.linear.default_kernel_init


def torch_conv_bias(fan_in: int):
    """Raw torch nn.Conv2d/nn.Linear default bias: U(+-1/sqrt(fan_in)),
    fan_in = (cin/groups)*kh*kw. 'tpu' scheme keeps zeros."""
    if _SCHEME == "reference":
        return _torch_default_bias(fan_in)
    return nn.initializers.zeros


def normal_fc():
    """Generic-trunk nn.Linear init: N(0, 0.0001) (resnet.py:289) —
    applies to the C5/2mlp RoI heads' fc1/fc2, whose _init_weights IS
    called (backbone/ResNet.py:201,270)."""
    if _SCHEME == "reference":
        return nn.initializers.normal(0.0001)
    return nn.linear.default_kernel_init


def affine_scale():
    """Frozen-BN affine scale: ones under BOTH schemes.

    AffineChannel2d's own init is U[0,1) (affine.py:12), but that never
    survives the reference's live path: models are built with
    nn.BatchNorm2d (weight=1 via _init_weights, running stats 0/1), and
    train_net.py:109-110 folds them via convert_bn2affine_model
    (merge=True, net.py:98-130) -> scale = 1/sqrt(1+eps) ~= 1, bias 0,
    then freezes. So the reference's effective from-scratch affine is
    unit scale, which ones matches (to 5e-6).
    """
    return nn.initializers.ones


def deconv_kernel_grouped(groups: int):
    """Initializer for an HWIO grouped-deconv kernel [kh,kw,cin/g,cout].

    reference: torch ConvTranspose2d default = kaiming_uniform(a=sqrt(5))
    over torch's transpose fan_in. torch stores the weight as
    (cin_total, cout/groups, kh, kw) and takes fan_in from dim 1 x the
    receptive field = (cout/groups)*kh*kw, which we recompute from our
    HWIO shape + the group count (verified against Grid_output's
    deconv_1 (cP->cP, g=P: fan=c*16) and deconv_2 (cP->P, g=P: fan=16),
    grid_rcnn/outputs.py:24-37).
    """
    if _SCHEME == "reference":
        def init(key, shape, dtype=jnp.float32):
            kh, kw, _, cout = shape
            fan = (cout // groups) * kh * kw  # torch transpose fan_in
            bound = math.sqrt(1.0 / fan)  # kaiming_uniform a=sqrt(5)
            return jax.random.uniform(
                key, shape, dtype, minval=-bound, maxval=bound
            )
        return init
    return nn.initializers.normal(0.001)


def deconv_bias(groups: int, kh: int = 4, kw: int = 4, prior: bool = False):
    """Grid deconv bias.

    reference: torch default U(+-1/sqrt(fan_in)) with the same transpose
    fan as the weight. tpu: zeros for deconv1; -log(0.99/0.01) prior for
    deconv2 (prior=True) — the reference's dead intended init.
    """
    if _SCHEME == "reference":
        def init(key, shape, dtype=jnp.float32):
            cout = shape[0]
            fan = (cout // groups) * kh * kw
            bound = 1.0 / math.sqrt(fan)
            return jax.random.uniform(
                key, shape, dtype, minval=-bound, maxval=bound
            )
        return init
    if prior:
        return lambda key, shape: jnp.full(
            shape, -float(np.log(0.99 / 0.01)), jnp.float32
        )
    return nn.initializers.zeros
