"""C4 (non-FPN) RoI box heads: the ResNet-stage-5 head family.

Parity with /root/reference/pet/rcnn/modeling/backbone/ResNet.py:
  * ResNet_C5_Head (:151-207): RoIAlign on the C4 map -> the backbone's
    stage-5 (layer4) Bottleneck stack, stride min(resolution)//7 -> 4D
    features; Box_output then global-average-pools (outputs.py:33-37).
  * ResNet_2mlp_Head (:210-301): layer4 over the *whole* C4 map -> 1x1
    conv to 256 + ReLU (conv_new) -> RoIAlign -> 2 FC.

Used with the `resnet_c4` backbone (ResNet.py:295-301, stride-16 trunk
that stops at C4) for the classic non-FPN Faster R-CNN path.

TPU notes: the Bottleneck stack is the same NHWC Flax block as the trunk
(one compilation; MXU-shaped convs); rois stay a fixed-size padded set.
"""

from typing import Sequence

from flax import linen as nn
import jax.numpy as jnp

from cpm_tpu.modeling import initializers as init_scheme
from cpm_tpu.modeling import registry
from cpm_tpu.modeling.backbone.resnet import Bottleneck
from cpm_tpu.ops.pooler import Pooler


def _stage5(
    x,
    *,
    n_blocks: int,
    stride: int,
    base_planes: int,
    width: int,
    groups: int,
    stride_3x3: bool,
    avg_down: bool,
    norm: str,
    conv: str,
    context: str,
    ctx_ratio: float,
    dilation: int,
):
    """The backbone's layer4 Bottleneck stack (block names layer4_{b},
    matching the trunk/importer convention)."""
    for b in range(n_blocks):
        x = Bottleneck(
            planes=base_planes * 8,
            base_width=width,
            stride=stride if b == 0 else 1,
            dilation=dilation,
            groups=groups,
            norm=norm,
            conv=conv,
            context=context,
            ctx_ratio=ctx_ratio,
            stride_3x3=stride_3x3,
            avg_down=avg_down,
            downsample=(b == 0),
            name=f"layer4_{b}",
        )(x)
    return x


@registry.ROI_BOX_HEADS.register("resnet_c5_head")
class ResNetC5Head(nn.Module):
    """RoIAlign(C4) -> stage-5 stack -> [R, h, w, 8*base_planes*4]
    (ResNet_C5_Head, ResNet.py:151-207). The stage stride is
    min(resolution)//7 (:195), so a 14x14 pool yields 7x7 features."""

    resolution: Sequence[int] = (14, 14)
    scales: Sequence[float] = (0.0625,)
    sampling_ratio: int = 0
    layers4: int = 3
    width: int = 64
    groups: int = 1
    stride_3x3: bool = False
    avg_down: bool = False
    norm: str = "affine"
    conv: str = "normal"
    context: str = "none"
    ctx_ratio: float = 0.0625
    c5_dilation: int = 1
    base_planes: int = 64

    @nn.compact
    def __call__(self, features, rois, roi_mask=None):
        pooler = Pooler(
            output_size=tuple(self.resolution),
            scales=tuple(self.scales),
            sampling_ratio=self.sampling_ratio,
        )
        x = pooler(features, rois, roi_mask)
        return _stage5(
            x,
            n_blocks=self.layers4,
            stride=min(self.resolution) // 7,
            base_planes=self.base_planes,
            width=self.width,
            groups=self.groups,
            stride_3x3=self.stride_3x3,
            avg_down=self.avg_down,
            norm=self.norm,
            conv=self.conv,
            context=self.context,
            ctx_ratio=self.ctx_ratio,
            dilation=self.c5_dilation,
        )


@registry.ROI_BOX_HEADS.register("resnet_2mlp_head")
class ResNet2MLPHead(nn.Module):
    """stage-5 over the full C4 map -> conv_new (1x1, 256) -> RoIAlign ->
    fc1 -> fc2 (ResNet_2mlp_Head, ResNet.py:210-301).

    As in the reference, the pooler uses the *passed-in* C4 spatial scale
    even though layer4 strides the map when C5_DILATION == 1; configs
    using this head set C5_DILATION: 2 to keep stride 1 (:241-242).
    """

    resolution: Sequence[int] = (7, 7)
    scales: Sequence[float] = (0.0625,)
    sampling_ratio: int = 0
    mlp_dim: int = 1024
    layers4: int = 3
    width: int = 64
    groups: int = 1
    stride_3x3: bool = False
    avg_down: bool = False
    norm: str = "affine"
    conv: str = "normal"
    context: str = "none"
    ctx_ratio: float = 0.0625
    c5_dilation: int = 1
    base_planes: int = 64

    @nn.compact
    def __call__(self, features, rois, roi_mask=None):
        x = _stage5(
            features[0],
            n_blocks=self.layers4,
            stride=2 if self.c5_dilation == 1 else 1,
            base_planes=self.base_planes,
            width=self.width,
            groups=self.groups,
            stride_3x3=self.stride_3x3,
            avg_down=self.avg_down,
            norm=self.norm,
            conv=self.conv,
            context=self.context,
            ctx_ratio=self.ctx_ratio,
            dilation=self.c5_dilation,
        )
        x = nn.relu(nn.Conv(
            256, (1, 1), use_bias=True,
            kernel_init=init_scheme.backbone_conv(), name="conv_new"
        )(x))
        pooler = Pooler(
            output_size=tuple(self.resolution),
            scales=tuple(self.scales),
            sampling_ratio=self.sampling_ratio,
        )
        x = pooler([x], rois, roi_mask)
        x = x.reshape(x.shape[0], -1)
        # generic-trunk _init_weights IS called by ResNet_2mlp_Head
        # (backbone/ResNet.py:270): Linear -> N(0, 0.0001)
        x = nn.relu(nn.Dense(
            self.mlp_dim, kernel_init=init_scheme.normal_fc(), name="fc1"
        )(x))
        x = nn.relu(nn.Dense(
            self.mlp_dim, kernel_init=init_scheme.normal_fc(), name="fc2"
        )(x))
        return x
