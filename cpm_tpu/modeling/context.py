"""Channel-context blocks used by backbone stage options.

Reference: SeConv2d (/root/reference/pet/lib/ops/squeeze_excitation.py:25)
and GlobalContextBlock (pet/lib/ops/global_context_block.py), selected by
``BACKBONE.RESNET.STAGE_WITH_CONTEXT`` (backbone/ResNet.py:44).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


class SeBlock(nn.Module):
    """Squeeze-and-excitation: GAP -> 1x1 reduce -> relu -> 1x1 expand -> sigmoid."""

    features: int
    reduced: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.features, (1, 1), name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class GlobalContextBlock(nn.Module):
    """GCNet block: softmax-attention pooling + channel transform (add fusion)."""

    features: int
    reduced: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        attn = nn.Conv(1, (1, 1), name="conv_mask")(x)  # [B,H,W,1]
        attn = jax.nn.softmax(attn.reshape(B, H * W, 1), axis=1)
        ctx = jnp.einsum(
            "bpc,bpo->boc", x.reshape(B, H * W, C), attn
        )  # [B,1,C]
        ctx = ctx.reshape(B, 1, 1, C)
        t = nn.Conv(self.reduced, (1, 1), name="transform_reduce")(ctx)
        t = nn.LayerNorm(name="transform_ln")(t)
        t = nn.relu(t)
        t = nn.Conv(self.features, (1, 1), name="transform_expand")(t)
        return x + t


def make_context(features: int, context: str, ctx_ratio: float = 0.0625):
    if context == "none":
        return None
    if context == "se":
        return SeBlock(features, max(1, int(features * ctx_ratio)))
    if context == "gcb":
        return GlobalContextBlock(features, max(1, int(features * ctx_ratio)))
    raise ValueError(f"unsupported context: {context}")
