"""Grid head Flax modules: conv tower, neighbor fusion, grouped deconv output.

Reference: /root/reference/pet/rcnn/modeling/grid_rcnn/heads/grid_heads.py
(roi_grid_head:14-161) and grid_rcnn/outputs.py (Grid_output:12-105,
Cls_output). Key structure:
  * 14x14 RoIAlign -> 8 convs of 64*P channels (first stride 2 -> 7x7),
    each followed by GroupNorm(4P) + ReLU (grid_heads.py:39-57);
  * first/second-order neighbor fusion: per grid point, 5x5 depthwise +
    1x1 transitions from 4-neighbors (grid_heads.py:101-119, 138-154);
  * output: two group deconvs (k4 s2, groups=P) 7x7 -> 14x14 -> 28x28
    heatmaps with GroupNorm(P)+ReLU between (outputs.py:24-37), final bias
    init -log(0.99/0.01) (grid_heads.py:129);
  * optional ISM IoU branch: 2 FC(1024) -> 2 logits on the 7x7 grid
    features (outputs.py:38-45).

TPU notes: grouped transposed conv is expressed as
lax.conv_general_dilated with lhs_dilation=2 and feature_group_count=P
(XLA has no native grouped conv_transpose). NHWC throughout; per-point
channel blocks are contiguous [..., P*c] slices.
"""

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cpm_tpu.modeling import initializers as init_scheme
from cpm_tpu.ops.pooler import Pooler


# ---- space-to-batch roi tiling (TPU.TILED_TOWERS) --------------------
#
# The grid towers run 3x3/5x5 convs over hundreds of tiny 7x7 (or 14x14)
# roi feature maps. XLA maps such batched-small-spatial convs onto the
# MXU at ~40% utilization (measured, docs/PROFILE.md). Tiling the rois
# into ONE large canvas with zero gaps turns them into a single
# large-spatial conv the MXU tiles well — and a zero gap of
# (kernel-1)//2 pixels between blocks makes the canvas conv EXACTLY
# per-roi zero padding: a roi-edge output pixel reads the gap's zeros,
# which is what padding would have supplied, and gap/padded-block
# outputs are discarded by the un-tiling slice. Stride-2 convs need an
# even pitch so block output offsets stay integral. GroupNorm stays
# per-roi (its statistics must not mix rois), so each layer re-tiles
# from per-roi tensors — which also re-zeroes the gaps.


def tile_rois(x: jnp.ndarray, pitch: int):
    """[R, s, s, C] -> ([1, gh*pitch, gw*pitch, C], (gh, gw)).

    Blocks are laid out row-major on a near-square grid at `pitch`
    (block size + zero gap); the grid's padding blocks are all-zero.
    """
    R, s = x.shape[0], x.shape[1]
    gw = max(1, math.isqrt(R))
    if gw * gw < R:
        gw += 1
    gh = -(-R // gw)
    x = jnp.pad(
        x, ((0, gh * gw - R), (0, pitch - s), (0, pitch - s), (0, 0))
    )
    x = x.reshape(gh, gw, pitch, pitch, x.shape[-1])
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(1, gh * pitch, gw * pitch, x.shape[-1]), (gh, gw)


def untile_rois(
    y: jnp.ndarray, grid: Tuple[int, int], s: int, pitch: int, num_rois: int
) -> jnp.ndarray:
    """Inverse of tile_rois for an output canvas at `pitch`: extract the
    [s, s] block interiors -> [num_rois, s, s, C] (gaps discarded)."""
    gh, gw = grid
    C = y.shape[-1]
    y = y.reshape(gh, pitch, gw, pitch, C).transpose(0, 2, 1, 3, 4)
    return y[:, :, :s, :s].reshape(gh * gw, s, s, C)[:num_rois]


def _gap_mask(grid: Tuple[int, int], s: int, pitch: int) -> jnp.ndarray:
    """[1, gh*pitch, gw*pitch, 1] canvas mask: 1 in block interiors,
    0 in the gaps (to re-zero conv spill between chained canvas convs)."""
    gh, gw = grid
    row = (jnp.arange(pitch) < s).astype(jnp.float32)
    m = row[:, None] * row[None, :]
    m = jnp.tile(m, (gh, gw))
    return m[None, :, :, None]


def get_neighbor_points(grid_size: int) -> List[Tuple[int, ...]]:
    """4-neighborhood in the reference's column-major point order
    (grid_heads.py:89-103: index = i * grid_size + j, i = column)."""
    pts = []
    for i in range(grid_size):
        for j in range(grid_size):
            nb = []
            if i > 0:
                nb.append((i - 1) * grid_size + j)
            if j > 0:
                nb.append(i * grid_size + j - 1)
            if j < grid_size - 1:
                nb.append(i * grid_size + j + 1)
            if i < grid_size - 1:
                nb.append((i + 1) * grid_size + j)
            pts.append(tuple(nb))
    return pts


def grouped_deconv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    groups: int,
) -> jnp.ndarray:
    """Transposed conv k4 s2 p1 with channel groups: [B,H,W,Cin] -> [B,2H,2W,Cout].

    Implemented as conv_general_dilated(lhs_dilation=2, padding=2) with a
    spatially-flipped kernel — the exact adjoint of a k4/s2/p1 conv.
    kernel: [4, 4, Cin//groups, Cout].
    """
    flipped = kernel[::-1, ::-1]
    out = jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


class TransitionConv(nn.Module):
    """5x5 depthwise + 1x1 pointwise transition (grid_heads.py:108-119)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        # raw nn.Conv2d in the reference -> torch default init; depthwise
        # fan_in = (c/groups)*25 = 25, pointwise fan_in = c
        x = nn.Conv(
            self.channels,
            (5, 5),
            padding=2,
            feature_group_count=self.channels,
            kernel_init=init_scheme.torch_conv_kernel(),
            bias_init=init_scheme.torch_conv_bias(25),
            name="dw",
        )(x)
        return nn.Conv(
            self.channels,
            (1, 1),
            kernel_init=init_scheme.torch_conv_kernel(),
            bias_init=init_scheme.torch_conv_bias(self.channels),
            name="pw",
        )(x)


class GridHead(nn.Module):
    """Pooled 14x14 features -> fused per-point feature stacks."""

    grid_points: int = 9
    roi_feat_size: int = 14
    num_convs: int = 8
    point_feat_channels: int = 64
    scales: Sequence[float] = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    fused_on: bool = True
    finest_level_only: bool = False
    offset_on: bool = False
    # space-to-batch tiling of the tower/fusion convs (TPU.TILED_TOWERS)
    tiled: bool = False

    @nn.compact
    def __call__(self, features, rois, roi_mask=None, *, pooled=None):
        """`pooled` [R, S, S, C] bypasses the RoI pooling (used by golden
        parity tests to drive the conv tower + fusion against the
        reference's torch modules, whose pooler needs the compiled _C
        extension and cannot run on CPU)."""
        P = self.grid_points
        c = self.point_feat_channels
        cout = c * P
        if pooled is not None:
            x = pooled
        else:
            scales = (
                (self.scales[0],)
                if self.finest_level_only
                else tuple(self.scales)
            )
            pooler = Pooler(
                output_size=(self.roi_feat_size, self.roi_feat_size),
                scales=scales,
                sampling_ratio=self.sampling_ratio,
            )
            x = pooler(
                features[:1] if self.finest_level_only else features,
                rois,
                roi_mask,
            )  # [R, 14, 14, C]

        # OFFSET_ON auxiliary branch (grid_heads.py:81-83,156-160): k3/s2
        # conv to 64ch + FC predicting 4 offsets per grid point from the
        # pooled roi feature. The reference's consumer (apply_offset,
        # grid_cascade_rcnn.py:226-228) is unimplemented upstream (raises
        # NameError); here the offsets condition the heatmap tower via an
        # additive embedding in GridOutput instead.
        x_offset = None
        if self.offset_on:
            xo = nn.Conv(
                64, (3, 3), strides=(2, 2), padding=1,
                kernel_init=init_scheme.tower_conv(), name="offset_conv"
            )(x)
            xo = nn.relu(xo)
            x_offset = nn.Dense(
                4 * P, kernel_init=init_scheme.mlp_fc(), name="offset_fc"
            )(
                xo.reshape(xo.shape[0], -1)
            )

        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            cin_i = x.shape[-1]
            conv = nn.Conv(
                cout, (3, 3), strides=(stride, stride), padding=1,
                kernel_init=init_scheme.torch_conv_kernel(),
                bias_init=init_scheme.torch_conv_bias(cin_i * 9),
                name=f"conv{i}",
            )
            s_in = x.shape[1]
            # stride-2 tiling needs an even block pitch (s_in + 2);
            # fall back to the per-roi conv for odd sizes
            if self.tiled and (stride == 1 or s_in % 2 == 0):
                pitch_in = s_in + (2 if stride == 2 else 1)
                xt, grid = tile_rois(x, pitch_in)
                y = conv(xt)
                x = untile_rois(
                    y, grid, s_in // stride, pitch_in // stride, x.shape[0]
                )
            else:
                x = conv(x)
            x = nn.GroupNorm(
                num_groups=4 * P, epsilon=1e-5, name=f"gn{i}"
            )(x)
            x = nn.relu(x)
        # x: [R, 7, 7, P*c], point p occupies channels [p*c, (p+1)*c)

        if not self.fused_on:
            return x, None, x_offset

        grid_size = int(math.isqrt(P))
        neighbors = get_neighbor_points(grid_size)

        def point(feat, p):
            return feat[..., p * c : (p + 1) * c]

        # Tiled fusion: one canvas at gap 2 (the 5x5 depthwise reads 2 px
        # across a block edge) shared by all ~48 transition convs; the
        # first-order sums' gap spill is re-zeroed before the
        # second-order convs read it, preserving per-roi zero-padding
        # semantics. Un-tile once at the end.
        if self.tiled:
            R, s = x.shape[0], x.shape[1]
            xf, grid = tile_rois(x, s + 2)
            rezero = _gap_mask(grid, s, s + 2).astype(x.dtype)
        else:
            xf = x

        x_fo = []
        for i, pts in enumerate(neighbors):
            acc = point(xf, i)
            for j, p_idx in enumerate(pts):
                acc = acc + TransitionConv(c, name=f"forder_{i}_{j}")(
                    point(xf, p_idx)
                )
            x_fo.append(acc)
        if self.tiled:
            x_fo = [f * rezero for f in x_fo]

        x_so = []
        for i, pts in enumerate(neighbors):
            acc = point(xf, i)
            for j, p_idx in enumerate(pts):
                acc = acc + TransitionConv(c, name=f"sorder_{i}_{j}")(
                    x_fo[p_idx]
                )
            x_so.append(acc)
        x_so = jnp.concatenate(x_so, axis=-1)
        if self.tiled:
            x_so = untile_rois(x_so, grid, s, s + 2, R)
        return x, x_so, x_offset


class GridOutput(nn.Module):
    """Group deconvs to half-size heatmaps + optional ISM IoU branch."""

    grid_points: int = 9
    point_feat_channels: int = 64
    iou_helper: bool = False
    se_on: bool = False
    fused_on: bool = True
    offset_on: bool = False
    # space-to-batch tiling of the grouped deconvs (TPU.TILED_TOWERS):
    # a canvas gap of 1 block pixel dilates (lhs_dilation=2) to 3 zeros,
    # which covers the k4 kernel's 3-cell reach across a block edge —
    # exactly the per-roi padding-2 adjoint semantics. GroupNorm and the
    # SE block (per-roi global pooling) stay per-roi between deconvs.
    tiled: bool = False

    @nn.compact
    def __call__(self, x, x_so, x_offset=None, train: bool = False):
        P = self.grid_points
        c = self.point_feat_channels
        cout = c * P

        # init per scheme: 'reference' = torch ConvTranspose2d defaults
        # (the explicit init in grid_heads.py:121-129, incl. the
        # -log(0.99/0.01) prior bias, is dead code upstream — never
        # called); 'tpu' = that intended-but-dead prior init. Kernel/bias
        # initializers return f32 explicitly — a weak-typed param leaf
        # changes aval after the first optimizer step and forces a full
        # retrace+recompile of the train step.
        deconv1_k = self.param(
            "deconv1_kernel",
            init_scheme.deconv_kernel_grouped(P),
            (4, 4, c, cout),  # groups=P: in c per group, out cout total
        )
        deconv1_b = self.param(
            "deconv1_bias", init_scheme.deconv_bias(P), (cout,)
        )
        deconv2_k = self.param(
            "deconv2_kernel", init_scheme.deconv_kernel_grouped(P),
            (4, 4, c, P),
        )
        deconv2_b = self.param(
            "deconv2_bias", init_scheme.deconv_bias(P, prior=True), (P,)
        )
        norm1 = nn.GroupNorm(num_groups=P, name="norm1")

        def deconv_maybe_tiled(h, kernel, bias):
            if not self.tiled:
                return grouped_deconv(h, kernel, bias, P)
            R, s = h.shape[0], h.shape[1]
            ht, grid = tile_rois(h, s + 1)
            y = grouped_deconv(ht, kernel, bias, P)
            return untile_rois(y, grid, 2 * s, 2 * (s + 1), R)

        def decode_tower(h):
            h = deconv_maybe_tiled(h, deconv1_k, deconv1_b)
            h = nn.relu(norm1(h))
            if self.se_on:
                from cpm_tpu.modeling.context import SeBlock

                h = SeBlock(cout, max(1, int(cout * 0.0625)), name="se")(h)
            return deconv_maybe_tiled(h, deconv2_k, deconv2_b)

        heatmap_fused = None
        if self.fused_on and x_so is not None:
            heatmap_fused = decode_tower(x_so)
        elif self.offset_on and x_offset is not None:
            # offset-conditioned tower (outputs.py:57-62: x2 = x + x_so with
            # x_so derived from the offset branch; the reference's producer
            # is unimplemented — see GridHead.offset_on note): the predicted
            # [R, 4P] offsets are embedded to the point-feature width and
            # added to the tower input.
            emb = nn.Dense(cout, name="offset_emb")(x_offset)
            heatmap_fused = decode_tower(x + emb[:, None, None, :])
        if train or not self.fused_on:
            heatmap_unfused = decode_tower(x)
        else:
            heatmap_unfused = heatmap_fused

        iou_logits = None
        if self.iou_helper:
            h = x.reshape(x.shape[0], -1)
            h = nn.relu(nn.Dense(
                1024, kernel_init=init_scheme.mlp_fc(), name="iou_fc1"
            )(h))
            h = nn.relu(nn.Dense(
                1024, kernel_init=init_scheme.mlp_fc(), name="iou_fc2"
            )(h))
            iou_logits = nn.Dense(
                2, kernel_init=nn.initializers.normal(0.01), name="iou_pred"
            )(h)

        # NHWC heatmaps -> [R, P, half, half] for decode/targets; logits
        # upcast to f32 (losses + grid decode are precision-sensitive)
        def to_pchw(hm):
            if hm is None:
                return None
            return jnp.transpose(hm, (0, 3, 1, 2)).astype(jnp.float32)

        if iou_logits is not None:
            iou_logits = iou_logits.astype(jnp.float32)
        return (
            dict(fused=to_pchw(heatmap_fused), unfused=to_pchw(heatmap_unfused)),
            iou_logits,
        )


class ClsHead(nn.Module):
    """7x7 RoIAlign -> 2 FC (cls_heads.py:12-48)."""

    resolution: Sequence[int] = (7, 7)
    scales: Sequence[float] = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    mlp_dim: int = 1024

    @nn.compact
    def __call__(self, features, rois, roi_mask=None):
        pooler = Pooler(
            output_size=tuple(self.resolution),
            scales=tuple(self.scales),
            sampling_ratio=self.sampling_ratio,
        )
        x = pooler(features, rois, roi_mask)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(
            self.mlp_dim, kernel_init=init_scheme.mlp_fc(), name="fc6"
        )(x))
        x = nn.relu(nn.Dense(
            self.mlp_dim, kernel_init=init_scheme.mlp_fc(), name="fc7"
        )(x))
        return x


class ClsOutput(nn.Module):
    """Linear classifier (outputs.py Cls_output:88-105)."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x).astype(jnp.float32)
