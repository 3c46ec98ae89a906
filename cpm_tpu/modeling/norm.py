"""Normalization layers.

The reference trains detection models with *frozen* BatchNorm folded into a
per-channel affine (`MODEL.BATCH_NORM = 'freeze'`,
/root/reference/pet/utils/net.py:98-130, pet/lib/ops/affine.py:5-17). On TPU
that is exactly a fused scale+bias — free under XLA fusion and no batch
statistics, so no SyncBN is needed (SURVEY §2.13).

`AffineChannel` holds (scale, bias) per channel. The torch->jax weight
importer folds pretrained BN (gamma, beta, mean, var) into these. Whether
the affine receives gradients is decided by the optimizer's parameter mask
(cpm_tpu/solver/optimizer.py), mirroring the reference's universal
freeze of AffineChannel2d params (backbone/ResNet.py:102).
"""

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling import initializers as init_scheme


class AffineChannel(nn.Module):
    """Per-channel y = x * scale + bias over the last (channel) axis.

    Fresh-init scale is ones under both schemes — matching the
    reference's effective from-scratch value after its BN->affine fold
    (see initializers.affine_scale for the derivation).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", init_scheme.affine_scale(), (self.features,)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class GroupNorm(nn.Module):
    """GroupNorm with the reference's group-count rule.

    Reference: pet/utils/net.py `get_group_gn` — NUM_GROUPS=32 when dim
    divisible, else DIM_PER_GP.
    """

    features: int
    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, name="gn"
        )(x)


def make_norm(features: int, norm: str = "affine") -> Callable:
    """Norm factory keyed by the reference's norm strings.

    'bn'/'affine'/'freeze' all map to AffineChannel because detection-time
    BN is always frozen in the reference recipe (net.py:98; SURVEY §6
    training recipe). 'gn' maps to GroupNorm. 'none' returns identity.
    """
    key = norm.split("_")[-1]
    if key in ("bn", "affine", "freeze"):
        return AffineChannel(features)
    if key == "gn":
        return GroupNorm(features)
    if key == "none":
        return lambda x: x
    raise ValueError(f"unsupported norm: {norm}")
