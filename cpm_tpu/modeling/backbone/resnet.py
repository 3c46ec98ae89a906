"""ResNet / ResNeXt detection backbones (Flax, NHWC).

Capability parity with /root/reference/pet/models/imagenet/resnet.py:14-260
(BasicBlock/Bottleneck with per-stage conv + context options) and the
detection wrappers pet/rcnn/modeling/backbone/ResNet.py:24-148 /
ResNeXt.py:19-132 (returns [C2..C5], spatial scales 1/4..1/32, freeze-at
semantics, C5 dilation). ResNeXt = Bottleneck with grouped 3x3
(feature_group_count = cardinality), matching resnext.py:16-120.

TPU-first choices:
  * NHWC layout (XLA's native conv layout on TPU).
  * Frozen BN is an AffineChannel — a fused scale+bias, no batch stats.
  * Parameter freezing (FREEZE_AT / affine freeze) is done by optimizer
    masks over param paths, not in-module mutation; modules here just
    declare params. See cpm_tpu/solver/optimizer.py.
  * Deform-conv stages use the gather+matmul kernel in
    cpm_tpu.ops.deform_conv.
"""

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling import registry
from cpm_tpu.modeling.context import make_context
from cpm_tpu.modeling import initializers as init_scheme
from cpm_tpu.modeling.norm import make_norm
from cpm_tpu.modeling.ws import maybe_ws
from cpm_tpu.ops.deform_conv import DeformConvPack, ModulatedDeformConvPack


def _Conv(*args, **kw):
    """nn.Conv with the active scheme's backbone kernel init.

    reference: kaiming_normal(fan_out, relu), matching the generic
    trunk _init_weights (pet/models/imagenet/resnet.py:281) which the
    detection ResNet inherits and calls (backbone/ResNet.py:86).
    Evaluated at trace time so build_model's set_scheme is honored.
    """
    return nn.Conv(*args, kernel_init=init_scheme.backbone_conv(), **kw)


class _S2DStem(nn.Module):
    """7x7/2 stem conv computed as a 4x4/1 conv over 2x2 space-to-depth
    packed input (the MLPerf-ResNet TPU trick).

    A 3-channel 7x7 conv runs the MXU at ~3/128 lane occupancy; packing
    2x2 pixel phases into channels quarters the spatial extent and
    raises the contraction depth to 12. The parameter KEEPS the
    reference shape [7,7,Cin,features] under the same ('conv1','kernel')
    path and init rng — checkpoints, the torch weight importer, and the
    fresh-init scheme are untouched; only the trace-time compute layout
    changes. Equivalence: pad the kernel to 8x8 with a zero row/col at
    index 0 (7x7 pad 3 == 8x8 pad 4), split each axis into
    (outer 4, phase 2), and fold (phase_y, phase_x, Cin) into the packed
    input channel — a stride-1 4x4 conv with asymmetric pad (2,1).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            init_scheme.backbone_conv(),
            (7, 7, cin, self.features),
            jnp.float32,
        )
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        k = kernel.astype(dt)
        B, H, W, _ = x.shape
        # [B,H,W,C] -> [B,H/2,W/2,4C], channel index (dy*2+dx)*C + c
        x2 = x.reshape(B, H // 2, 2, W // 2, 2, cin)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, H // 2, W // 2, 4 * cin
        )
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8,8,C,O]
        w4 = kp.reshape(4, 2, 4, 2, cin, self.features)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * cin, self.features
        )
        return jax.lax.conv_general_dilated(
            x2,
            w4,
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _conv_op(conv: str, features: int, stride: int, dilation: int,
             name: str, groups: int = 1):
    """3x3 conv selected by the stage's conv option (resnet.py:20-28).

    groups > 1 = ResNeXt cardinality; the reference's ResNeXt-DCN
    configs run the deform 3x3 GROUPED (resnext.py:44-46, conv_op(...,
    groups=C)), so the deform packs take the same group count."""
    if conv == "normal":
        return _Conv(
            features,
            (3, 3),
            strides=(stride, stride),
            padding=dilation,
            kernel_dilation=(dilation, dilation),
            feature_group_count=groups,
            use_bias=False,
            name=name,
        )
    if conv == "deform":
        return DeformConvPack(
            features, 3, stride=stride, dilation=dilation, groups=groups,
            name=name,
        )
    if conv == "deformv2":
        return ModulatedDeformConvPack(
            features, 3, stride=stride, dilation=dilation, groups=groups,
            name=name,
        )
    raise ValueError(f"unsupported conv op: {conv}")


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride placement per stride_3x3) -> 1x1 with residual.

    Mirrors resnet.py:71-137. `groups`>1 gives the ResNeXt variant
    (resnext.py:70-120: grouped 3x3, width = planes * base_width/64 *
    cardinality scaling).
    """

    planes: int
    base_width: int = 64
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = "affine"
    conv: str = "normal"
    context: str = "none"
    ctx_ratio: float = 0.0625
    stride_3x3: bool = False
    avg_down: bool = False
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        s1, s3 = (1, self.stride) if self.stride_3x3 else (self.stride, 1)
        if self.groups == 1:
            width = int(self.planes * (self.base_width / 64.0))
        else:
            # ResNeXt width rule (resnext.py:79): planes * (base_width/64) * C... the
            # standard 32x4d/64x4d widths come out as planes//2*groups*width/64*2.
            width = int(
                math.floor(self.planes * (self.base_width / 64.0)) * self.groups
            )
        out_dim = self.planes * self.expansion

        h = _Conv(
            width, (1, 1), strides=(s1, s1), use_bias=False, name="conv1"
        )(x)
        h = make_norm(width, self.norm)(h) if self.norm != "none" else h
        h = nn.relu(h)

        h = _conv_op(
            self.conv, width, s3, self.dilation, "conv2",
            groups=self.groups,
        )(h)
        h = make_norm(width, self.norm)(h)
        h = nn.relu(h)

        h = _Conv(out_dim, (1, 1), use_bias=False, name="conv3")(h)
        h = make_norm(out_dim, self.norm)(h)

        ctx = make_context(out_dim, self.context, self.ctx_ratio)
        if ctx is not None:
            h = ctx(h)

        if self.downsample:
            r = x
            if self.avg_down and self.stride > 1:
                r = nn.avg_pool(
                    r,
                    (self.stride, self.stride),
                    strides=(self.stride, self.stride),
                )
                r = _Conv(
                    out_dim, (1, 1), use_bias=False, name="downsample_conv"
                )(r)
            else:
                r = _Conv(
                    out_dim,
                    (1, 1),
                    strides=(self.stride, self.stride),
                    use_bias=False,
                    name="downsample_conv",
                )(r)
            r = make_norm(out_dim, self.norm)(r)
        else:
            r = x
        return nn.relu(h + r)


class AlignedBottleneck(nn.Module):
    """Two-branch aligned bottleneck (BACKBONE.*.USE_ALIGN).

    Mirrors resnet.py:139-217 / resnext.py:88-170: branch1 = 1x1 -> 3x3
    (stride), branch2 = 1x1 (half width) -> 3x3 (stride) -> 3x3, concat,
    norm+relu, 1x1 projection, optional context, residual. The stride
    always sits on the 3x3s. `groups`>1 gives the ResNeXt variant
    (branch2 runs at groups//2, resnext.py:122)."""

    planes: int
    base_width: int = 64
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = "affine"
    conv: str = "normal"
    context: str = "none"
    ctx_ratio: float = 0.0625
    stride_3x3: bool = False  # unused: stride is always on the 3x3s
    avg_down: bool = False
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        if self.groups == 1:
            width = int(self.planes * (self.base_width / 64.0))
        else:
            width = int(
                math.floor(self.planes * (self.base_width / 64.0))
                * self.groups
            )
        half = width // 2
        g1, g2 = self.groups, max(self.groups // 2, 1)
        out_dim = self.planes * self.expansion

        def conv3(features, stride, groups, name):
            return _conv_op(
                self.conv, features, stride, self.dilation, name,
                groups=groups,
            )

        b1 = _Conv(width, (1, 1), use_bias=False, name="conv1_1")(x)
        b1 = make_norm(width, self.norm)(b1)
        b1 = nn.relu(b1)
        b1 = conv3(width, self.stride, g1, "conv1_2")(b1)

        b2 = _Conv(half, (1, 1), use_bias=False, name="conv2_1")(x)
        b2 = make_norm(half, self.norm)(b2)
        b2 = nn.relu(b2)
        b2 = conv3(half, self.stride, g2, "conv2_2")(b2)
        b2 = make_norm(half, self.norm)(b2)
        b2 = nn.relu(b2)
        b2 = conv3(half, 1, g2, "conv2_3")(b2)

        h = jnp.concatenate([b1, b2], axis=-1)
        h = make_norm(width + half, self.norm)(h)
        h = nn.relu(h)

        h = _Conv(out_dim, (1, 1), use_bias=False, name="conv")(h)
        h = make_norm(out_dim, self.norm)(h)

        ctx = make_context(out_dim, self.context, self.ctx_ratio)
        if ctx is not None:
            h = ctx(h)

        if self.downsample:
            r = x
            if self.avg_down and self.stride > 1:
                r = nn.avg_pool(
                    r,
                    (self.stride, self.stride),
                    strides=(self.stride, self.stride),
                )
                r = _Conv(
                    out_dim, (1, 1), use_bias=False, name="downsample_conv"
                )(r)
            else:
                r = _Conv(
                    out_dim,
                    (1, 1),
                    strides=(self.stride, self.stride),
                    use_bias=False,
                    name="downsample_conv",
                )(r)
            r = make_norm(out_dim, self.norm)(r)
        else:
            r = x
        return nn.relu(h + r)


class BasicBlock(nn.Module):
    """Two 3x3 convs with residual (resnet.py:14-68)."""

    planes: int
    base_width: int = 64
    stride: int = 1
    dilation: int = 1
    norm: str = "affine"
    conv: str = "normal"
    context: str = "none"
    ctx_ratio: float = 0.0625
    avg_down: bool = False
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0))
        h = _conv_op(self.conv, width, self.stride, self.dilation, "conv1")(x)
        h = make_norm(width, self.norm)(h)
        h = nn.relu(h)
        h = _conv_op(self.conv, width, 1, self.dilation, "conv2")(h)
        h = make_norm(width, self.norm)(h)
        ctx = make_context(width, self.context, self.ctx_ratio)
        if ctx is not None:
            h = ctx(h)
        if self.downsample:
            r = _Conv(
                width,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            r = make_norm(width, self.norm)(r)
        else:
            r = x
        return nn.relu(h + r)


class ResNetBody(nn.Module):
    """Detection trunk returning [C2, C3, C4, C5] NHWC feature maps.

    Matches ResNet.forward (backbone/ResNet.py:123-148): 7x7/2 stem (or
    3x3x3 stem), 3x3/2 maxpool, four stages with strides (1,2,2,2) and
    optional C5 dilation.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    bottleneck: bool = True
    aligned: bool = False  # USE_ALIGN: AlignedBottleneck blocks
    groups: int = 1  # ResNeXt cardinality; 1 = plain ResNet
    stride_3x3: bool = False
    avg_down: bool = False
    use_3x3x3stem: bool = False
    # compute the 7x7/2 stem as a 4x4/1 conv over 2x2 space-to-depth
    # input (TPU.S2D_STEM; param tree unchanged — see _S2DStem)
    s2d_stem: bool = False
    norm: str = "affine"
    stage_with_conv: Sequence[str] = ("normal",) * 4
    stage_with_context: Sequence[str] = ("none",) * 4
    ctx_ratio: float = 0.0625
    c5_dilation: int = 1
    # TPU-test extension: shrink all channel widths by setting base stage
    # planes < 64 (structure preserved; used by tiny CI/dryrun models).
    base_planes: int = 64

    @property
    def dim_out(self) -> Tuple[int, ...]:
        e = 4 if self.bottleneck else 1
        return tuple(
            self.base_planes * e * (2**i) for i in range(len(self.layers))
        )

    @property
    def spatial_scale(self) -> Tuple[float, ...]:
        scales = [1 / 4.0, 1 / 8.0, 1 / 16.0]
        if len(self.layers) == 4:
            scales.append(1 / 32.0 * self.c5_dilation)
        return tuple(scales)

    @nn.compact
    def __call__(self, x):
        norm = self.norm
        bp = self.base_planes
        if not self.use_3x3x3stem:
            if (
                self.s2d_stem
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            ):
                h = _S2DStem(bp, name="conv1")(x)
            else:
                h = _Conv(
                    bp, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1",
                )(x)
            h = make_norm(bp, norm)(h)
            h = nn.relu(h)
        else:
            h = _Conv(
                bp // 2, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                name="conv1",
            )(x)
            h = make_norm(bp // 2, norm)(h)
            h = nn.relu(h)
            h = _Conv(
                bp // 2, (3, 3), padding=1, use_bias=False, name="conv2"
            )(h)
            h = make_norm(bp // 2, norm)(h)
            h = nn.relu(h)
            h = _Conv(
                bp, (3, 3), padding=1, use_bias=False, name="conv3"
            )(h)
            h = make_norm(bp, norm)(h)
            h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        planes = (bp, bp * 2, bp * 4, bp * 8)
        strides = (1, 2, 2, 2)
        dilations = [1, 1, 1, 1]
        if len(self.layers) == 4 and self.c5_dilation != 1:
            strides = (1, 2, 2, 1)
            dilations[3] = self.c5_dilation
        if self.bottleneck:
            block_cls = AlignedBottleneck if self.aligned else Bottleneck
        else:
            block_cls = BasicBlock
        for i, n_blocks in enumerate(self.layers):
            for b in range(n_blocks):
                kw: Any = dict(
                    planes=planes[i],
                    base_width=self.width,
                    stride=strides[i] if b == 0 else 1,
                    dilation=dilations[i],
                    norm=norm,
                    conv=self.stage_with_conv[i],
                    context=self.stage_with_context[i],
                    ctx_ratio=self.ctx_ratio,
                    avg_down=self.avg_down,
                    downsample=(b == 0),
                    name=f"layer{i + 1}_{b}",
                )
                if self.bottleneck:
                    kw.update(
                        groups=self.groups, stride_3x3=self.stride_3x3
                    )
                h = block_cls(**kw)(h)
            feats.append(h)
        return feats


@registry.BACKBONES.register("resnet")
def build_resnet(cfg):
    r = cfg.BACKBONE.RESNET
    norm = "gn" if r.USE_GN else "affine"
    # USE_WS: reference gate backbone/ResNet.py:291-292
    return maybe_ws(ResNetBody, r.USE_WS)(
        base_planes=getattr(r, "BASE_PLANES", 64),
        layers=tuple(r.LAYERS),
        width=r.WIDTH,
        bottleneck=r.BOTTLENECK,
        aligned=r.USE_ALIGN,
        groups=1,
        stride_3x3=r.STRIDE_3X3,
        avg_down=r.AVG_DOWN,
        use_3x3x3stem=r.USE_3x3x3HEAD,
        s2d_stem=getattr(cfg.TPU, "S2D_STEM", False),
        norm=norm,
        stage_with_conv=tuple(r.STAGE_WITH_CONV),
        stage_with_context=tuple(r.STAGE_WITH_CONTEXT),
        ctx_ratio=r.CTX_RATIO,
        c5_dilation=r.C5_DILATION,
    )


@registry.BACKBONES.register("resnet_c4")
def build_resnet_c4(cfg):
    """Stride-16 trunk stopping at C4 (backbone/ResNet.py:295-301:
    stride=16 truncates LAYERS to the first 3 stages). Pairs with the
    resnet_c5_head / resnet_2mlp_head RoI heads for non-FPN models."""
    r = cfg.BACKBONE.RESNET
    norm = "gn" if r.USE_GN else "affine"
    return maybe_ws(ResNetBody, r.USE_WS)(
        base_planes=getattr(r, "BASE_PLANES", 64),
        layers=tuple(r.LAYERS)[:3],
        width=r.WIDTH,
        bottleneck=r.BOTTLENECK,
        aligned=r.USE_ALIGN,
        groups=1,
        stride_3x3=r.STRIDE_3X3,
        avg_down=r.AVG_DOWN,
        use_3x3x3stem=r.USE_3x3x3HEAD,
        s2d_stem=getattr(cfg.TPU, "S2D_STEM", False),
        norm=norm,
        stage_with_conv=tuple(r.STAGE_WITH_CONV)[:3],
        stage_with_context=tuple(r.STAGE_WITH_CONTEXT)[:3],
        ctx_ratio=r.CTX_RATIO,
        c5_dilation=r.C5_DILATION,
    )


@registry.BACKBONES.register("resnext")
def build_resnext(cfg):
    r = cfg.BACKBONE.RESNEXT
    norm = "gn" if r.USE_GN else "affine"
    return maybe_ws(ResNetBody, r.USE_WS)(
        layers=tuple(r.LAYERS),
        width=r.WIDTH,
        bottleneck=True,
        aligned=r.USE_ALIGN,
        groups=r.C,
        stride_3x3=True,  # ResNeXt puts the stride on the grouped 3x3
        avg_down=r.AVG_DOWN,
        use_3x3x3stem=r.USE_3x3x3HEAD,
        s2d_stem=getattr(cfg.TPU, "S2D_STEM", False),
        norm=norm,
        stage_with_conv=tuple(r.STAGE_WITH_CONV),
        stage_with_context=tuple(r.STAGE_WITH_CONTEXT),
        ctx_ratio=r.CTX_RATIO,
        c5_dilation=r.C5_DILATION,
    )
