"""Alternative FPN necks: HRFPN, NASFPN, BiFPN.

Weight-level parity with the reference registrations
(pet/rcnn/modeling/fpn/HRFPN.py:14, NASFPN.py:72, BiFPN.py:52 — all in
FPN_BODY; none used by CPM configs). Each module mirrors the reference's
parameterization one-for-one so torch weights map across directly;
activation parity is pinned by tests/test_necks_oracle.py, which drives
the reference's own torch modules with shared weights.

Architecture semantics mirrored exactly:
  * HRFPN (HRFPN.py:61-75): bilinear-upsample every level to the finest
    resolution (align_corners=False), concat, 1x1 reduce, then an
    AVG/MAX pooling pyramid with per-level 3x3 convs.
  * NASFPN (NASFPN.py:141-169): NUM_STACK stacked stages of the fixed
    9-cell GP/Sum wiring; GP cells gate with a sigmoid of the GLOBAL MAX
    pool (AdaptiveMaxPool2d, NASFPN.py:61); resize is nearest-up /
    max-pool-down (MergingCell._resize, NASFPN.py:29-38); the two
    mid-stage GP cells carry no conv (with_conv=False, NASFPN.py:109,112).
  * BiFPN (BiFPN.py:136-159): NUM_STACK stacked top-down + bottom-up
    stages with learned scalar fusion weights. Fusion3D reproduces the
    reference's published formula verbatim — the third input enters the
    numerator UN-weighted as `x3 + w3` (BiFPN.py:45), not `x3 * w3`; we
    match it because that is what reference checkpoints train against.

All static Python control flow (level counts, stack counts) — traced
once per config under jit; NHWC throughout.
"""

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling import registry
from cpm_tpu.modeling.fpn import get_min_max_levels
from cpm_tpu.modeling.norm import make_norm


# ---------------------------------------------------------------------------
# torch-exact resizes
# ---------------------------------------------------------------------------


def _interp_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """F.interpolate(mode='nearest') to an explicit size: src index =
    floor(dst * in/out) per axis."""
    h, w = x.shape[1:3]
    th, tw = out_hw
    ri = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
    return x[:, ri][:, :, ci]


def _interp_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False): half-pixel
    source coords clamped to the valid range (upsample path)."""
    h, w = x.shape[1:3]
    th, tw = out_hw

    def axis(n_in, n_out):
        src = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = jnp.clip(src, 0.0, n_in - 1.0)
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        frac = (src - i0).astype(x.dtype)
        return i0, i1, frac

    r0, r1, fr = axis(h, th)
    c0, c1, fc = axis(w, tw)
    top = x[:, r0] * (1.0 - fr)[None, :, None, None] + (
        x[:, r1] * fr[None, :, None, None]
    )
    return top[:, :, c0] * (1.0 - fc)[None, None, :, None] + (
        top[:, :, c1] * fc[None, None, :, None]
    )


def _max_pool_ceil(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """F.max_pool2d(kernel, stride=kernel, ceil_mode=True): pad with -inf
    up to a kernel multiple, then VALID pool."""
    h, w = x.shape[1:3]
    ph = (-h) % kh
    pw = (-w) % kw
    if ph or pw:
        x = jnp.pad(
            x,
            ((0, 0), (0, ph), (0, pw), (0, 0)),
            constant_values=-jnp.inf,
        )
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


def _resize_merge(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """MergingCell._resize (NASFPN.py:29-38) == BiFPN.resize (BiFPN.py:13):
    nearest up, max-pool (ceil_mode) down with kernel ceil(in/out)."""
    h, w = x.shape[1:3]
    th, tw = out_hw
    if (h, w) == (th, tw):
        return x
    if h < th:
        return _interp_nearest(x, out_hw)
    return _max_pool_ceil(x, math.ceil(h / th), math.ceil(w / tw))


# ---------------------------------------------------------------------------
# make_conv mirror (pet/utils/net.py:9-50)
# ---------------------------------------------------------------------------


class RefConv(nn.Module):
    """conv [+ norm] [+ relu] [+ suffix 1x1], matching make_conv's layout.

    use_bn maps to this project's frozen-affine BN convention
    (cpm_tpu/modeling/norm.py docstring); the reference defaults all
    norm flags off for these necks.
    """

    features: int
    kernel: int = 3
    use_dwconv: bool = False
    use_bn: bool = False
    use_gn: bool = False
    use_relu: bool = False
    suffix_1x1: bool = False

    @nn.compact
    def __call__(self, x):
        groups = x.shape[-1] if self.use_dwconv else 1
        bias = not (self.use_bn or self.use_gn)
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=pad,
            feature_group_count=groups,
            use_bias=bias,
            name="conv",
        )(x)
        if self.use_bn:
            x = make_norm(self.features, "bn")(x)
        if self.use_gn:
            x = make_norm(self.features, "gn")(x)
        if self.use_relu:
            x = nn.relu(x)
        if self.suffix_1x1:
            x = nn.Conv(
                self.features, (1, 1), use_bias=bias, name="suffix"
            )(x)
        return x


# ---------------------------------------------------------------------------
# HRFPN
# ---------------------------------------------------------------------------


class HRFPN(nn.Module):
    """HRFPN.py:14-75. Output: len(feats)+num_extra_pooling levels,
    fine -> coarse."""

    fpn_dim: int = 256
    pooling: str = "AVG"
    num_extra_pooling: int = 1
    use_lite: bool = False
    use_bn: bool = False
    use_gn: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        num_output = len(feats) + self.num_extra_pooling
        ups = [feats[0]]
        for i in range(1, len(feats)):
            h, w = feats[i].shape[1:3]
            ups.append(
                _interp_bilinear(feats[i], (h * 2**i, w * 2**i))
            )
        x = jnp.concatenate(ups, axis=-1)
        x = RefConv(
            self.fpn_dim, 1, use_bn=self.use_bn, use_gn=self.use_gn,
            name="reduction_conv",
        )(x)

        def pool(v, k):
            if self.pooling == "AVG":
                return nn.avg_pool(v, (k, k), strides=(k, k))
            return nn.max_pool(v, (k, k), strides=(k, k))

        outs = [x] + [pool(x, 2**i) for i in range(1, num_output)]
        return [
            RefConv(
                self.fpn_dim, 3, use_dwconv=self.use_lite,
                use_bn=self.use_bn, use_gn=self.use_gn,
                suffix_1x1=self.use_lite, name=f"fpn_conv{i}",
            )(outs[i])
            for i in range(num_output)
        ]


# ---------------------------------------------------------------------------
# NASFPN
# ---------------------------------------------------------------------------


class MergeCell(nn.Module):
    """SumCell / GPCell (NASFPN.py:13-65): resize both inputs to
    out_size, binary-op, then optional relu->3x3 conv."""

    fpn_dim: int
    op: str  # 'sum' | 'gp'
    with_conv: bool = True
    use_lite: bool = False
    use_bn: bool = False
    use_gn: bool = False

    @nn.compact
    def __call__(self, x1, x2, out_hw):
        x1 = _resize_merge(x1, out_hw)
        x2 = _resize_merge(x2, out_hw)
        if self.op == "gp":
            att = jax.nn.sigmoid(
                jnp.max(x1, axis=(1, 2), keepdims=True)
            )
            x = x1 + x2 * att
        else:
            x = x1 + x2
        if self.with_conv:
            x = RefConv(
                self.fpn_dim, 3, use_dwconv=self.use_lite,
                use_bn=self.use_bn, use_gn=self.use_gn,
                suffix_1x1=self.use_lite, name="conv_out",
            )(nn.relu(x))
        return x


# (cell key, op, with_conv) in the reference's stage order NASFPN.py:99-115
_NASFPN_CELLS = (
    ("gp_64_4", "gp", True),
    ("sum_44_4", "sum", True),
    ("sum_43_3", "sum", True),
    ("sum_43_4", "sum", True),
    ("gp_43_5", "gp", False),
    ("sum_55_5", "sum", True),
    ("gp_54_7", "gp", False),
    ("sum_77_7", "sum", True),
    ("gp_75_6", "gp", True),
)


class NASFPN(nn.Module):
    """NASFPN.py:72-169. Fixed 5-level cell wiring over
    num_backbone_stages 1x1-reduced inputs + stride-2 extra levels."""

    fpn_dim: int = 256
    num_stack: int = 7
    min_level: int = 2
    lowest_backbone_lvl: int = 2
    extra_levels: int = 1
    use_lite: bool = False
    use_bn: bool = False
    use_gn: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        n_stages = len(feats) - (self.min_level - self.lowest_backbone_lvl)
        px = [
            RefConv(
                self.fpn_dim, 1, use_bn=self.use_bn, use_gn=self.use_gn,
                name=f"nasfpn_in{i}",
            )(feats[-1 - i])
            for i in range(n_stages)
        ]
        for _ in range(self.extra_levels):
            # F.max_pool2d(kernel=1, stride=2) == stride-2 subsample
            px.insert(0, px[0][:, ::2, ::2, :])
        assert len(px) == 5, (
            f"NASFPN's cell wiring is fixed at 5 levels (NASFPN.py:150), "
            f"got {len(px)} from the level config"
        )
        p7, p6, p5, p4, p3 = px

        def hw(t):
            return t.shape[1:3]

        for s in range(self.num_stack):
            cells = {
                key: MergeCell(
                    self.fpn_dim, op, with_conv=wc,
                    use_lite=self.use_lite, use_bn=self.use_bn,
                    use_gn=self.use_gn, name=f"stage{s}_{key}",
                )
                for key, op, wc in _NASFPN_CELLS
            }
            p4_1 = cells["gp_64_4"](p6, p4, hw(p4))
            p4_2 = cells["sum_44_4"](p4_1, p4, hw(p4))
            p3 = cells["sum_43_3"](p4_2, p3, hw(p3))
            p4 = cells["sum_43_4"](p4_2, p3, hw(p4))
            p5_tmp = cells["gp_43_5"](p4, p3, hw(p5))
            p5 = cells["sum_55_5"](p5, p5_tmp, hw(p5))
            p7_tmp = cells["gp_54_7"](p5, p4_2, hw(p7))
            p7 = cells["sum_77_7"](p7, p7_tmp, hw(p7))
            p6 = cells["gp_75_6"](p7, p5, hw(p6))
        return [p3, p4, p5, p6, p7]


# ---------------------------------------------------------------------------
# BiFPN
# ---------------------------------------------------------------------------


class Fusion(nn.Module):
    """Fusion2D/Fusion3D (BiFPN.py:25-45). n=3 reproduces the reference's
    formula verbatim: the third input is UN-weighted (`x3 + w3`)."""

    n: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, *xs):
        init = 0.5 if self.n == 2 else 0.333
        ws = [
            self.param(
                f"w{i + 1}",
                nn.initializers.constant(init),
                (1,),
            )
            for i in range(self.n)
        ]
        if self.n == 2:
            num = xs[0] * ws[0] + xs[1] * ws[1]
        else:
            num = xs[0] * ws[0] + xs[1] * ws[1] + xs[2] + ws[2]
        return num / (sum(ws) + self.eps)


class BiFPN(nn.Module):
    """BiFPN.py:52-159: NUM_STACK top-down + bottom-up stages, scalar
    fusion weights, 3x3 convs after every fusion."""

    fpn_dim: int = 256
    num_stack: int = 7
    eps: float = 1e-4
    min_level: int = 2
    lowest_backbone_lvl: int = 2
    extra_levels: int = 1
    use_lite: bool = False
    use_bn: bool = False
    use_gn: bool = False

    def _conv(self, name):
        return RefConv(
            self.fpn_dim, 3, use_dwconv=self.use_lite,
            use_bn=self.use_bn, use_gn=self.use_gn,
            use_relu=self.use_bn or self.use_gn,
            suffix_1x1=self.use_lite, name=name,
        )

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        n_stages = len(feats) - (self.min_level - self.lowest_backbone_lvl)
        px = [
            RefConv(
                self.fpn_dim, 1, use_bn=self.use_bn, use_gn=self.use_gn,
                name=f"bifpn_in{i}",
            )(feats[-1 - i])
            for i in range(n_stages)
        ]
        for _ in range(self.extra_levels):
            px.insert(0, nn.max_pool(px[0], (2, 2), strides=(2, 2)))
        assert len(px) == 5, (
            f"BiFPN's stage wiring is fixed at 5 levels (BiFPN.py:145), "
            f"got {len(px)} from the level config"
        )
        p7, p6, p5, p4, p3 = px
        s7, s6, s5, s4, s3 = (t.shape[1:3] for t in px)

        for s in range(self.num_stack):
            def fuse(key, n, *xs):
                return Fusion(n, eps=self.eps, name=f"stage{s}_{key}")(*xs)

            p6_td = self._conv(f"stage{s}_p6_td_conv")(
                fuse("p6_td_fusion", 2, p6, _resize_merge(p7, s6))
            )
            p5_td = self._conv(f"stage{s}_p5_td_conv")(
                fuse("p5_td_fusion", 2, p5, _resize_merge(p6_td, s5))
            )
            p4_td = self._conv(f"stage{s}_p4_td_conv")(
                fuse("p4_td_fusion", 2, p4, _resize_merge(p5_td, s4))
            )
            p3 = self._conv(f"stage{s}_p3_out_conv")(
                fuse("p3_out_fusion", 2, p3, _resize_merge(p4_td, s3))
            )
            p4 = self._conv(f"stage{s}_p4_out_conv")(
                fuse("p4_out_fusion", 3, p4, p4_td, _resize_merge(p3, s4))
            )
            p5 = self._conv(f"stage{s}_p5_out_conv")(
                fuse("p5_out_fusion", 3, p5, p5_td, _resize_merge(p4, s5))
            )
            p6 = self._conv(f"stage{s}_p6_out_conv")(
                fuse("p6_out_fusion", 3, p6, p6_td, _resize_merge(p5, s6))
            )
            p7 = self._conv(f"stage{s}_p7_out_conv")(
                fuse("p7_out_fusion", 2, p7, _resize_merge(p6, s7))
            )
        return [p3, p4, p5, p6, p7]


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


@registry.FPN_BODY.register("hrfpn")
def build_hrfpn(cfg):
    h = cfg.FPN.HRFPN
    return HRFPN(
        fpn_dim=h.DIM,
        pooling=h.POOLING_TYPE,
        num_extra_pooling=h.NUM_EXTRA_POOLING,
        use_lite=h.USE_LITE,
        use_bn=h.USE_BN,
        use_gn=h.USE_GN,
    )


@registry.FPN_BODY.register("nasfpn")
def build_nasfpn(cfg):
    n = cfg.FPN.NASFPN
    min_level, max_level = get_min_max_levels(cfg)
    return NASFPN(
        fpn_dim=n.DIM,
        num_stack=n.NUM_STACK,
        min_level=min_level,
        lowest_backbone_lvl=cfg.FPN.LOWEST_BACKBONE_LVL,
        extra_levels=max_level - cfg.FPN.HIGHEST_BACKBONE_LVL,
        use_lite=n.USE_LITE,
        use_bn=n.USE_BN,
        use_gn=n.USE_GN,
    )


@registry.FPN_BODY.register("bifpn")
def build_bifpn(cfg):
    b = cfg.FPN.BIFPN
    min_level, max_level = get_min_max_levels(cfg)
    return BiFPN(
        fpn_dim=b.DIM,
        num_stack=b.NUM_STACK,
        eps=b.EPS,
        min_level=min_level,
        lowest_backbone_lvl=cfg.FPN.LOWEST_BACKBONE_LVL,
        extra_levels=max_level - cfg.FPN.HIGHEST_BACKBONE_LVL,
        use_lite=b.USE_LITE,
        use_bn=b.USE_BN,
        use_gn=b.USE_GN,
    )
