"""Feature Pyramid Network neck (Flax, NHWC).

Capability parity with /root/reference/pet/rcnn/modeling/fpn/FPN.py:14-139:
top-down P2..P5 from [C2..C5], stride-2 subsample P6 (the "maxpool" with
kernel 1), optional extra stride-2 conv levels (RetinaNet-style), level
bounds from the RPN/ROI min/max config (FPN.py:124-139).

Upsampling is nearest-neighbor x2 done with a reshape+broadcast (cheap and
XLA-fusable) rather than a resize gather.
"""

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling import initializers as init_scheme

from cpm_tpu.modeling import registry
from cpm_tpu.modeling.norm import make_norm


def _Conv(*args, **kw):
    """nn.Conv with the scheme's FPN kernel init (reference:
    kaiming_uniform(a=1), FPN.py:86; bias zeros, :88)."""
    return nn.Conv(*args, kernel_init=init_scheme.fpn_conv(), **kw)

def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 2H, 2W, C] nearest neighbor."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def get_min_max_levels(cfg):
    """FPN.py:124-139."""
    min_level = cfg.FPN.LOWEST_BACKBONE_LVL
    max_level = cfg.FPN.HIGHEST_BACKBONE_LVL
    if cfg.FPN.MULTILEVEL_RPN and not cfg.FPN.MULTILEVEL_ROIS:
        max_level, min_level = cfg.FPN.RPN_MAX_LEVEL, cfg.FPN.RPN_MIN_LEVEL
    if not cfg.FPN.MULTILEVEL_RPN and cfg.FPN.MULTILEVEL_ROIS:
        max_level, min_level = cfg.FPN.ROI_MAX_LEVEL, cfg.FPN.ROI_MIN_LEVEL
    if cfg.FPN.MULTILEVEL_RPN and cfg.FPN.MULTILEVEL_ROIS:
        max_level = max(cfg.FPN.RPN_MAX_LEVEL, cfg.FPN.ROI_MAX_LEVEL)
        min_level = min(cfg.FPN.RPN_MIN_LEVEL, cfg.FPN.ROI_MIN_LEVEL)
    return min_level, max_level


class FPN(nn.Module):
    """Builds [P2..P6] (or up to max_level) from [C2..C5]."""

    fpn_dim: int = 256
    min_level: int = 2
    max_level: int = 6
    lowest_backbone_lvl: int = 2
    highest_backbone_lvl: int = 5
    extra_conv_levels: bool = False
    use_c5: bool = True
    norm: str = "none"

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        num_backbone_stages = len(feats) - (
            self.min_level - self.lowest_backbone_lvl
        )

        def maybe_norm(h):
            if self.norm != "none":
                h = make_norm(h.shape[-1], self.norm)(h)
            return h

        c5 = feats[-1]
        px = maybe_norm(
            _Conv(self.fpn_dim, (1, 1), name="p5_in")(c5)
        )
        outputs = [
            maybe_norm(_Conv(self.fpn_dim, (3, 3), padding=1, name="p5_out")(px))
        ]
        for i in range(num_backbone_stages - 1):
            cx = feats[-i - 2]
            lateral = maybe_norm(
                _Conv(self.fpn_dim, (1, 1), name=f"fpn_in_{i}")(cx)
            )
            if lateral.shape[1:3] != px.shape[1:3]:
                px = nearest_upsample_2x(px)
            px = lateral + px
            outputs.insert(
                0,
                maybe_norm(
                    _Conv(
                        self.fpn_dim, (3, 3), padding=1, name=f"fpn_out_{i}"
                    )(px)
                ),
            )

        if (
            not self.extra_conv_levels
            and self.max_level == self.highest_backbone_lvl + 1
        ):
            # P6 = stride-2 subsample of P5 (kernel-1 "maxpool", FPN.py:54)
            outputs.append(outputs[-1][:, ::2, ::2, :])

        if self.extra_conv_levels and self.max_level > self.highest_backbone_lvl:
            p_in = c5 if self.use_c5 else outputs[-1]
            for j, lvl in enumerate(
                range(self.highest_backbone_lvl + 1, self.max_level + 1)
            ):
                if j > 0:
                    p_in = nn.relu(outputs[-1])
                outputs.append(
                    maybe_norm(
                        _Conv(
                            self.fpn_dim,
                            (3, 3),
                            strides=(2, 2),
                            padding=1,
                            name=f"extra_p{lvl}",
                        )(p_in)
                    )
                )
        return outputs


@registry.FPN_BODY.register("fpn")
def build_fpn(cfg):
    from cpm_tpu.modeling.ws import maybe_ws

    min_level, max_level = get_min_max_levels(cfg)
    norm = "gn" if cfg.FPN.USE_GN else ("bn" if cfg.FPN.USE_BN else "none")
    # USE_WS: reference gate fpn/FPN.py:77-78
    return maybe_ws(FPN, cfg.FPN.USE_WS)(
        fpn_dim=cfg.FPN.DIM,
        min_level=min_level,
        max_level=max_level,
        lowest_backbone_lvl=cfg.FPN.LOWEST_BACKBONE_LVL,
        highest_backbone_lvl=cfg.FPN.HIGHEST_BACKBONE_LVL,
        extra_conv_levels=cfg.FPN.EXTRA_CONV_LEVELS,
        use_c5=cfg.FPN.USE_C5,
        norm=norm,
    )


def fpn_spatial_scales(cfg, backbone_scales):
    """Spatial scales of the FPN outputs [P_min..P_max]."""
    _, max_level = get_min_max_levels(cfg)
    scales = list(backbone_scales)
    while len(scales) < max_level - 1:
        scales.append(scales[-1] * 0.5)
    return tuple(scales)
