"""Conv/norm/activation layer zoo.

Parity with the reference's pet/lib/ops layer modules (SURVEY §2.4):
Conv2dWS (weight standardization), Conv2dSamePadding, SplAtConv2d
(split-attention, ResNeSt), DropBlock2D, L2Norm, Scale, Mish / Swish /
HSwish, ECA (efficient channel attention), NonLocal2d, NaiveSyncBatchNorm
(cross-device BN; on TPU expressed with nn.BatchNorm(axis_name='data') —
XLA's psum replaces the reference's all_gather of mean/meansqr,
pet/lib/ops/batch_norm.py:68-104), MixtureBatchNorm2d / MixtureGroupNorm
(attentive-norm variants). All NHWC Flax modules.
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def swish(x):
    return x * jax.nn.sigmoid(x)


def h_swish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def h_sigmoid(x):
    """H_Sigmoid (pet/lib/ops/swish.py:12-15)."""
    return jax.nn.relu6(x + 3.0) / 6.0


class SwishX(nn.Module):
    """Swish clamped above a learnable maximum (pet/lib/ops/swish.py:26-33):
    out = min(x*sigmoid(x), maximal) with `maximal` a trained scalar."""

    maxvalue: float = 2.72

    @nn.compact
    def __call__(self, x):
        maximal = self.param(
            "maximal",
            lambda key: jnp.asarray([self.maxvalue], jnp.float32),
        )
        return jnp.minimum(x * jax.nn.sigmoid(x) - maximal, 0.0) + maximal


class Scale(nn.Module):
    """Learnable scalar multiplier (pet/lib/ops scale.py)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param(
            "scale", lambda k, sh: jnp.full(sh, self.init_value), ()
        )
        return x * s


class L2Norm(nn.Module):
    """Channel L2 normalization with learnable scale (SSD-style)."""

    features: int
    init_scale: float = 20.0

    @nn.compact
    def __call__(self, x, eps: float = 1e-10):
        g = self.param(
            "weight",
            lambda k, sh: jnp.full(sh, self.init_scale),
            (self.features,),
        )
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)
        return g * x / norm


class Conv2dWS(nn.Module):
    """Conv with weight standardization (pet/lib/ops conv2d_ws.py)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (kh, kw, cin, self.features)
        )
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(kernel, axis=(0, 1, 2), keepdims=True) + 1e-5
        kernel = (kernel - mean) / std
        out = jax.lax.conv_general_dilated(
            x, kernel, tuple(self.strides),
            [(self.padding, self.padding)] * 2
            if isinstance(self.padding, int)
            else self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        return out


class Conv2dSamePadding(nn.Module):
    """TensorFlow-style "SAME" conv (pet/lib/ops/conv2d_samepadding.py).

    The reference reimplements TF SAME padding in torch (asymmetric
    ceil-div padding so out = ceil(in/stride)); XLA's "SAME" padding IS
    that rule, so this is nn.Conv with padding="SAME" — kept as a named
    module for registry/API parity with the reference's layer zoo.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    kernel_dilation: Sequence[int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding="SAME",
            kernel_dilation=tuple(self.kernel_dilation),
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
        )(x)


class DropBlock2D(nn.Module):
    """DropBlock regularization (pet/lib/ops dropblock.py)."""

    drop_prob: float = 0.1
    block_size: int = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.drop_prob == 0.0:
            return x
        B, H, W, C = x.shape
        gamma = (
            self.drop_prob
            / (self.block_size**2)
            * (H * W)
            / max((H - self.block_size + 1) * (W - self.block_size + 1), 1)
        )
        rng = self.make_rng("dropout")
        seeds = jax.random.bernoulli(rng, gamma, (B, H, W, C))
        # expand seeds to blocks via max pooling
        mask = nn.max_pool(
            seeds.astype(x.dtype),
            (self.block_size, self.block_size),
            strides=(1, 1),
            padding="SAME",
        )
        keep = 1.0 - mask
        denom = jnp.maximum(jnp.mean(keep), 1e-6)
        return x * keep / denom


class ECA(nn.Module):
    """Efficient channel attention (efficient_channel_attention.py)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))  # [B, C]
        s = s[:, :, None]  # [B, C, 1]
        w = nn.Conv(
            1, (self.kernel_size,),
            padding=self.kernel_size // 2,
            use_bias=False,
            name="conv1d",
        )(s)  # over the channel axis
        attn = jax.nn.sigmoid(w[:, :, 0])
        return x * attn[:, None, None, :]


class NonLocal2d(nn.Module):
    """Non-local block (embedded gaussian) — global_context cousins."""

    inner: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        theta = nn.Conv(self.inner, (1, 1), name="theta")(x).reshape(
            B, H * W, self.inner
        )
        phi = nn.Conv(self.inner, (1, 1), name="phi")(x).reshape(
            B, H * W, self.inner
        )
        g = nn.Conv(self.inner, (1, 1), name="g")(x).reshape(
            B, H * W, self.inner
        )
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", theta, phi)
            / jnp.sqrt(float(self.inner)),
            axis=-1,
        )
        y = jnp.einsum("bij,bjc->bic", attn, g).reshape(B, H, W, self.inner)
        y = nn.Conv(C, (1, 1), name="out")(y)
        return x + y


class SplAtConv2d(nn.Module):
    """Split-attention conv (ResNeSt; pet/lib/ops splat.py)."""

    features: int
    radix: int = 2
    reduction: int = 4
    kernel_size: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        r = self.radix
        conv = nn.Conv(
            self.features * r,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=self.kernel_size // 2,
            feature_group_count=r,
            name="conv",
        )(x)
        conv = nn.relu(conv)
        B, H, W, _ = conv.shape
        splits = conv.reshape(B, H, W, r, self.features)
        gap = jnp.mean(jnp.sum(splits, axis=3), axis=(1, 2))  # [B, F]
        inner = max(self.features // self.reduction, 8)
        att = nn.relu(nn.Dense(inner, name="fc1")(gap))
        att = nn.Dense(r * self.features, name="fc2")(att)
        att = jax.nn.softmax(
            att.reshape(B, r, self.features), axis=1
        )
        out = jnp.sum(
            splits * att[:, None, None, :, :], axis=3
        )
        return out


class SyncBatchNorm(nn.Module):
    """Cross-device batch norm.

    The reference's NaiveSyncBatchNorm all_gathers (mean, mean^2)
    (batch_norm.py:88-104); on a TPU mesh the same statistics come from
    nn.BatchNorm's axis_name, which lowers to one psum over 'data'.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = "data"

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=None if use_running_average else self.axis_name,
            name="bn",
        )(x)


class MixtureNorm(nn.Module):
    """Attentive normalization: K affine params mixed by a squeeze
    attention (mixture_batchnorm.py). Base statistics: 'bn' (per-batch) or
    'gn' (group norm)."""

    features: int
    k: int = 10
    base: str = "gn"
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.base == "gn":
            h = nn.GroupNorm(
                num_groups=min(self.num_groups, self.features),
                use_bias=False,
                use_scale=False,
                name="base",
            )(x)
        else:
            h = nn.BatchNorm(
                use_running_average=deterministic,
                use_bias=False,
                use_scale=False,
                name="base",
            )(x)
        gammas = self.param(
            "gammas", nn.initializers.ones, (self.k, self.features)
        )
        betas = self.param(
            "betas", nn.initializers.zeros, (self.k, self.features)
        )
        s = jnp.mean(x, axis=(1, 2))  # [B, C]
        att = jax.nn.softmax(
            nn.Dense(self.k, name="att")(s), axis=-1
        )  # [B, K]
        gamma = att @ gammas  # [B, C]
        beta = att @ betas
        return h * gamma[:, None, None, :] + beta[:, None, None, :]
