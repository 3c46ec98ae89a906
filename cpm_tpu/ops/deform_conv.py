"""Deformable convolution v1/v2 for TPU.

Replaces the reference CUDA im2col kernels
(/root/reference/pet/lib/ops/csrc/Deformable/deform_conv_cuda_kernel.cu:215-
950 and the Python wrappers pet/lib/ops/deform_conv.py:472,515 —
``DeformConvPack`` / ``ModulatedDeformConvPack`` predict their own offsets
with an internal conv).

TPU-native formulation: the CUDA code builds a deformable im2col buffer with
scalar bilinear loops; here the same math is expressed as

  1. a regular conv predicts per-tap offsets (and masks for v2),
  2. a vectorized bilinear gather samples the input at
     ``p + k + offset_k`` for all K*K taps at once (4 corner gathers),
  3. one big matmul ``[B*H*W, K*K*C] x [K*K*C, Cout]`` — the FLOPs land on
     the MXU and XLA fuses the gather weights elementwise.

Backward is XLA autodiff (scatter-add of the gathers — the deterministic
equivalent of the CUDA atomic adds).
"""

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Sampler selection is PROCESS-GLOBAL: read once at import (like
# clustered_pallas's CPM_TPU_POOLER_CLUSTER_DIV) so the knob can't be
# silently baked into one jitted executable and ignored afterwards.
# 'corner4' = 4 independent corner gathers; default = windowed 2x2 gather
# with the hand-written backward (docs/PROFILE.md eleventh pass).
_DEFORM_IMPL = os.environ.get("CPM_TPU_DEFORM_IMPL", "")


def _bilinear_gather_corner4(feat, ys, xs):
    """Sample feat [B, H, W, C] at float coords ys/xs [B, P] -> [B, P, C].

    Out-of-range samples contribute zero, matching the CUDA
    `dmcn_im2col_bilinear` bounds handling
    (deform_conv_cuda_kernel.cu:25-60).
    """
    B, H, W, C = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def corner(yi, xi, w):
        inb = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = feat.reshape(B, H * W, C)
        idx = yc * W + xc  # [B, P]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * (w * inb.astype(w.dtype))[..., None].astype(feat.dtype)

    out = (
        corner(y0, x0, wy0 * wx0)
        + corner(y0, x0 + 1, wy0 * wx1)
        + corner(y0 + 1, x0, wy1 * wx0)
        + corner(y0 + 1, x0 + 1, wy1 * wx1)
    )
    return out


def _window_parts(feat, ys, xs):
    """Shared window/weight construction for the 2x2-window sampler.

    Returns (win [B,P,2,2,C], wy [B,P,2], wx [B,P,2], sy, sx, valid
    row/col masks). Window start is clamped to [0, H-2]x[0, W-2]; each
    window cell (i, j) at image row/col (sy+i, sx+j) gets the tent
    weight relu(1-|ys-(sy+i)|) * relu(1-|xs-(sx+j)|), zeroed out of
    bounds — for interior samples the cells ARE the 4 bilinear corners,
    and samples fully outside contribute zero, matching
    `dmcn_im2col_bilinear` (deform_conv_cuda_kernel.cu:25-60).
    """
    B, H, W, C = feat.shape
    sy = jnp.clip(jnp.floor(ys), 0, max(H - 2, 0)).astype(jnp.int32)
    sx = jnp.clip(jnp.floor(xs), 0, max(W - 2, 0)).astype(jnp.int32)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    starts = jnp.stack([sy, sx], axis=-1)  # [B, P, 2]
    win = jax.lax.gather(
        feat, starts, dnums,
        slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B, P, 2, 2, C]

    ii = jnp.arange(2, dtype=jnp.float32)
    ry = sy[..., None].astype(jnp.float32) + ii  # [B, P, 2] image rows
    rx = sx[..., None].astype(jnp.float32) + ii
    vy = ry <= H - 1  # ry >= 0 by construction
    vx = rx <= W - 1
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[..., None] - ry)) * vy
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[..., None] - rx)) * vx
    return win, wy, wx, sy, sx, ry, rx, vy, vx


@jax.custom_vjp
def _bilinear_gather(feat, ys, xs):
    """Sample feat [B, H, W, C] at f32 coords ys/xs [B, P] -> [B, P, C].

    ONE batched `lax.gather` of 2x2xC windows instead of 4 independent
    corner gathers: XLA:TPU gather cost is index-bound, so collapsing
    the 4 corners into one windowed read is ~1.5x cheaper end-to-end.
    The backward is hand-written (see `_bilinear_gather_bwd`): XLA's
    autodiff of a windowed gather emits a windowed scatter that is
    ~50x slower than the flat-index scatter floor measured by
    tools/probe_dcn_scatter.py.
    """
    ys = ys.astype(jnp.float32)
    xs = xs.astype(jnp.float32)
    win, wy, wx, *_ = _window_parts(feat, ys, xs)
    w = (wy[..., :, None] * wx[..., None, :]).astype(feat.dtype)
    return jnp.einsum("bpijc,bpij->bpc", win, w)


def _bilinear_gather_fwd(feat, ys, xs):
    return _bilinear_gather(feat, ys, xs), (feat, ys, xs)


def _bilinear_gather_bwd(res, g):
    """Backward: regather the window (cheap, index-bound), coordinate
    grads from the tent derivative, and ONE flat-index scatter-add of
    each sample's weighted 2x2xC block into a [B, (H-1)*(W-1), 4C]
    accumulator laid out by window start — folded back onto the feature
    grid with 4 shifted adds. This keeps the scatter at P indices
    (the measured XLA floor) instead of 4P row scatters or the
    pathological windowed scatter."""
    feat, ys, xs = res
    B, H, W, C = feat.shape
    P = ys.shape[1]
    win, wy, wx, sy, sx, ry, rx, vy, vx = _window_parts(feat, ys, xs)

    # coordinate grads: t_ij = <win_ij, g>_C
    t = jnp.einsum(
        "bpijc,bpc->bpij",
        win.astype(jnp.float32),
        g.astype(jnp.float32),
    )
    # d wy_i / d ys = -sign(ys - ry_i) on the open tent support
    dy = ys[..., None] - ry
    dwy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0) * vy
    dx = xs[..., None] - rx
    dwx = jnp.where(jnp.abs(dx) < 1.0, -jnp.sign(dx), 0.0) * vx
    gys = jnp.einsum("bpij,bpi,bpj->bp", t, dwy, wx)
    gxs = jnp.einsum("bpij,bpi,bpj->bp", t, wy, dwx)

    # feat grad: weighted blocks, one scatter by window start
    w = (wy[..., :, None] * wx[..., None, :]).astype(g.dtype)
    blocks = (g[..., None, None, :] * w[..., None]).reshape(B, P, 4 * C)
    Hs, Ws = max(H - 1, 1), max(W - 1, 1)
    flat = sy * Ws + sx  # starts are in [0, H-2] x [0, W-2]
    acc = jnp.zeros((B, Hs * Ws, 4 * C), g.dtype)
    acc = acc.at[jnp.arange(B)[:, None], flat].add(blocks)
    acc = acc.reshape(B, Hs, Ws, 2, 2, C)
    # fold: feat_grad[y, x] += acc[y - i, x - j, i, j]
    gf = jnp.zeros((B, H, W, C), g.dtype)
    for i in (0, 1):
        for j in (0, 1):
            gf = gf.at[:, i : i + Hs, j : j + Ws].add(acc[:, :, :, i, j])
    return gf.astype(feat.dtype), gys, gxs


_bilinear_gather.defvjp(_bilinear_gather_fwd, _bilinear_gather_bwd)


def deform_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Deformable conv core.

    Args:
      x: [B, H, W, Cin] input (NHWC).
      weight: [kh, kw, Cin // groups, Cout].
      offset: [B, Ho, Wo, 2*kh*kw] per-tap (dy, dx) pairs, ordered
        (dy0, dx0, dy1, dx1, ...) over taps row-major — the layout of the
        reference's offset conv output (deform_conv.py:472).
      mask: optional [B, Ho, Wo, kh*kw] modulation (DCNv2); None = v1.
      groups: conv channel groups (the reference's ResNeXt-DCN configs
        run the bottleneck 3x3 as a GROUPED deform conv with
        groups=cardinality, resnext.py:44-46; offsets stay ungrouped —
        deformable_groups is 1 throughout the reference's configs).
    Returns: [B, Ho, Wo, Cout].
    """
    B, H, W, Cin = x.shape
    kh, kw, w_cin, Cout = weight.shape
    assert w_cin * groups == Cin, (weight.shape, Cin, groups)
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # Base sampling grid: output position * stride - pad + tap * dilation.
    # Coordinate math stays f32 regardless of the compute dtype: bf16
    # has ~8 mantissa bits, so positions past ~128 px would quantize to
    # whole-pixel steps and destroy the sub-pixel offsets DCN learns.
    oy = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation
    base_y = oy[:, None, None, None] + ky[None, None, :, None]  # [Ho,1,kh,1]
    base_x = ox[None, :, None, None] + kx[None, None, None, :]  # [1,Wo,1,kw]
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, kh, kw)).reshape(Ho, Wo, K)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, kh, kw)).reshape(Ho, Wo, K)

    off = offset.astype(jnp.float32).reshape(B, Ho, Wo, K, 2)
    ys = base_y[None] + off[..., 0]
    xs = base_x[None] + off[..., 1]

    P = Ho * Wo * K
    gather = (
        _bilinear_gather_corner4
        if _DEFORM_IMPL == "corner4"
        # the windowed gather's (1,2,2,C) slice needs >= 2 rows/cols
        or H < 2 or W < 2
        else _bilinear_gather
    )
    sampled = gather(x, ys.reshape(B, P), xs.reshape(B, P))
    sampled = sampled.reshape(B, Ho, Wo, K, Cin)
    if mask is not None:
        sampled = sampled * mask[..., None]

    # im2col matmul on the MXU.
    cols = sampled.reshape(B, Ho, Wo, K * Cin)
    if groups == 1:
        w2 = weight.reshape(K * Cin, Cout)
    else:
        # grouped (ResNeXt-DCN): input block g feeds only output block g
        # (torch semantics; the HWIO weight's Cout axis is groups-major).
        # Contract through a BLOCK-DIAGONAL dense weight instead of a
        # per-group batched GEMM: with cardinality-32 widths each group's
        # GEMM is [.,72]x[72,8] — the N=8 output tile wastes 15/16 of the
        # MXU lanes and measured 992 ms/step end-to-end on X-101 vs
        # 713 ms for the dense contraction (docs/PROFILE.md twelfth
        # pass). The zero blocks cost FLOPs the MXU has to spare; the
        # parameter stays the grouped [kh,kw,Cin/g,Cout] shape the
        # reference checkpoint carries, and autodiff through the one-hot
        # mask yields exactly the per-block gradient.
        Cg = Cin // groups
        Cog = Cout // groups
        w5 = weight.reshape(kh * kw, Cg, groups, Cog)
        eye = jnp.eye(groups, dtype=weight.dtype)
        dense = jnp.einsum("kcgo,gh->khcgo", w5, eye)
        w2 = dense.reshape(K * Cin, Cout)
    return jnp.einsum(
        "bhwk,kc->bhwc", cols, w2, preferred_element_type=jnp.float32
    ).astype(x.dtype)


class DeformConvPack(nn.Module):
    """DCNv1 with self-predicted offsets (deform_conv.py:472-511)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        offset = nn.Conv(
            2 * k * k,
            (k, k),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros,
            name="conv_offset",
        )(x)
        cin = x.shape[-1] // self.groups
        # named "weight" (not flax's conventional "kernel"), mirroring the
        # reference where DeformConv registers self.weight on a plain
        # nn.Module (deform_conv.py:472-511) — NOT an nn.Conv2d, so the
        # reference's convert_conv2convws_model (isinstance _ConvNd)
        # never weight-standardizes it. Our USE_WS transform skips
        # non-"kernel" leaves for the same effect (modeling/ws.py).
        weight = self.param(
            "weight",
            nn.initializers.he_normal(),
            (k, k, cin, self.features),
        )
        out = deform_conv2d(
            x, weight, offset, None, self.stride, pad, self.dilation,
            self.groups,
        )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        return out


class ModulatedDeformConvPack(nn.Module):
    """DCNv2 with self-predicted offsets + sigmoid mask (deform_conv.py:515-558)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        om = nn.Conv(
            3 * k * k,
            (k, k),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros,
            name="conv_offset_mask",
        )(x)
        offset, mask = om[..., : 2 * k * k], om[..., 2 * k * k :]
        mask = jax.nn.sigmoid(mask)
        cin = x.shape[-1] // self.groups
        # "weight", not "kernel": see DeformConvPack — keeps the deform
        # main weight out of the USE_WS name-based standardization rule,
        # matching the reference's isinstance(_ConvNd) conversion scope
        weight = self.param(
            "weight",
            nn.initializers.he_normal(),
            (k, k, cin, self.features),
        )
        out = deform_conv2d(
            x, weight, offset, mask, self.stride, pad, self.dilation,
            self.groups,
        )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        return out
