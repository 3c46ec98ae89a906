"""Region Proposal Network — head, anchors, proposal selection, loss.

Capability parity with /root/reference/pet/rcnn/modeling/rpn/ :
  * cell anchors use Detectron's exact rounding numerics
    (anchor_generator.py:221-291), meshgrid shifts (:73-95), and
    straddle-threshold visibility (:97-110);
  * the shared 3x3+1x1 head (rpn.py:12-41);
  * proposal selection per level: sigmoid -> topk pre_nms -> decode -> clip
    -> remove-small -> per-image NMS -> post_nms_top_n (inference.py:70-113),
    then cross-level selection including the Detectron per-*batch* train
    topk quirk (inference.py:145-172) and train-time add-GT
    (inference.py:44-65);
  * loss: match at (0.7, 0.3) with low-quality recovery, 256 samples/img at
    0.5 positive fraction, BCE objectness + smooth-L1 box (loss.py:88-125).

TPU-native design: everything is fixed-shape. Proposals are padded
[B, K, 4] with validity masks; NMS is the fixed-point masked kernel from
cpm_tpu.ops.nms; sampling is rank-threshold random masking; anchors are
trace-time numpy constants (shapes are static per compiled bucket).
"""

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cpm_tpu.ops.box_coder import BoxCoder
from cpm_tpu.ops.losses import smooth_l1_loss
from cpm_tpu.ops.nms import nms
from cpm_tpu.structures.boxes import box_iou, clip_boxes_to_image
from cpm_tpu.utils.matcher import (
    BELOW_LOW_THRESHOLD,
    BETWEEN_THRESHOLDS,
    match_boxes,
)
from cpm_tpu.utils.sampler import balanced_sample


# --------------------------------------------------------------------------
# Anchors (Detectron numerics, anchor_generator.py:221-291)
# --------------------------------------------------------------------------

def generate_cell_anchors(
    stride: int = 16,
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """[A, 4] xyxy anchors centered on the (0,0) cell, Detectron rounding."""
    scales = np.array(sizes, dtype=np.float64) / stride
    ratios = np.array(aspect_ratios, dtype=np.float64)
    anchor = np.array([1, 1, stride, stride], dtype=np.float64) - 1

    def whctrs(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mkanchors(ws, hs, x_ctr, y_ctr):
        ws, hs = ws[:, None], hs[:, None]
        return np.hstack(
            (
                x_ctr - 0.5 * (ws - 1),
                y_ctr - 0.5 * (hs - 1),
                x_ctr + 0.5 * (ws - 1),
                y_ctr + 0.5 * (hs - 1),
            )
        )

    w, h, x_ctr, y_ctr = whctrs(anchor)
    size_ratios = (w * h) / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = mkanchors(ws, hs, x_ctr, y_ctr)

    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, x_ctr, y_ctr = whctrs(ratio_anchors[i])
        out.append(mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    return np.vstack(out).astype(np.float32)


def grid_anchors(
    cell_anchors: np.ndarray, feat_h: int, feat_w: int, stride: int
) -> np.ndarray:
    """[H*W*A, 4] anchors for one level, (h, w, a) order to match NHWC
    head-output flattening (anchor_generator.py:73-95)."""
    shift_x = np.arange(feat_w, dtype=np.float32) * stride
    shift_y = np.arange(feat_h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # [H, W]
    shifts = np.stack(
        [sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1
    )  # [H*W, 4]
    anchors = shifts[:, None, :] + cell_anchors[None, :, :]
    return anchors.reshape(-1, 4)


class AnchorLayout:
    """Static per-compile anchor set over all FPN levels.

    Built from feature shapes at trace time; arrays are numpy constants that
    XLA folds into the program.
    """

    def __init__(
        self,
        feat_shapes: Sequence[Tuple[int, int]],
        strides: Sequence[int],
        sizes: Sequence[float],
        aspect_ratios: Sequence[float],
        straddle_thresh: float = 0.0,
    ):
        if len(strides) == 1:
            cell = [generate_cell_anchors(strides[0], sizes, aspect_ratios)]
        else:
            assert len(strides) == len(sizes), "FPN needs one size per stride"
            cell = [
                generate_cell_anchors(
                    s, sz if isinstance(sz, (tuple, list)) else (sz,),
                    aspect_ratios,
                )
                for s, sz in zip(strides, sizes)
            ]
        self.num_cell_anchors = cell[0].shape[0]
        self.per_level = [
            grid_anchors(c, h, w, s)
            for c, (h, w), s in zip(cell, feat_shapes, strides)
        ]
        self.level_sizes = [a.shape[0] for a in self.per_level]
        self.all = np.concatenate(self.per_level, axis=0)  # [N, 4]
        self.straddle_thresh = straddle_thresh

    def visibility(self, image_sizes: jnp.ndarray) -> jnp.ndarray:
        """[B, N] bool: anchor fully inside the (true) image +/- straddle.

        anchor_generator.py:97-110. straddle_thresh < 0 means all visible.
        """
        a = jnp.asarray(self.all)
        if self.straddle_thresh < 0:
            return jnp.ones(
                (image_sizes.shape[0], a.shape[0]), dtype=bool
            )
        t = self.straddle_thresh
        h = image_sizes[:, 0:1].astype(a.dtype)
        w = image_sizes[:, 1:2].astype(a.dtype)
        return (
            (a[None, :, 0] >= -t)
            & (a[None, :, 1] >= -t)
            & (a[None, :, 2] < w + t)
            & (a[None, :, 3] < h + t)
        )


# --------------------------------------------------------------------------
# Head (rpn.py:12-41)
# --------------------------------------------------------------------------

class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 objectness / 1x1 bbox heads, applied per level."""

    num_anchors: int

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        dim = features[0].shape[-1]
        conv = nn.Conv(
            dim, (3, 3), padding=1, name="conv",
            kernel_init=nn.initializers.normal(0.01),
        )
        cls_logits = nn.Conv(
            self.num_anchors, (1, 1), name="cls_logits",
            kernel_init=nn.initializers.normal(0.01),
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (1, 1), name="bbox_pred",
            kernel_init=nn.initializers.normal(0.01),
        )
        logits, bbox_reg = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(cls_logits(t))  # [B, H, W, A]
            bbox_reg.append(bbox_pred(t))  # [B, H, W, 4A]
        return logits, bbox_reg


# --------------------------------------------------------------------------
# Proposal selection (inference.py)
# --------------------------------------------------------------------------

def _flatten_level(obj: jnp.ndarray, reg: jnp.ndarray):
    """NHWC level outputs -> ([B, HWA], [B, HWA, 4]) in (h, w, a) order."""
    B, H, W, A = obj.shape
    return obj.reshape(B, H * W * A), reg.reshape(B, H * W * A, 4)


def select_proposals(
    layout: AnchorLayout,
    objectness: Sequence[jnp.ndarray],
    box_regression: Sequence[jnp.ndarray],
    image_sizes: jnp.ndarray,
    *,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
    fpn_post_nms_top_n: int,
    fpn_post_nms_per_batch: bool,
    is_train: bool,
    box_coder: Optional[BoxCoder] = None,
    gt_boxes: Optional[jnp.ndarray] = None,
    gt_mask: Optional[jnp.ndarray] = None,
    approx_topk: bool = False,
):
    """Fixed-shape RPN proposal selection.

    Args:
      objectness/box_regression: per-level NHWC head outputs.
      image_sizes: [B, 2] true (h, w).
      gt_boxes/gt_mask: [B, G, 4]/[B, G]; appended when training
        (inference.py:44-65).

    Returns: (proposals [B, K, 4], scores [B, K], mask [B, K]) where
      K = fpn_post_nms_top_n (+ G at train).
    """
    if box_coder is None:
        box_coder = BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))
    B = objectness[0].shape[0]
    # box decode / NMS IoU always in f32 (bf16 coords quantize to ~8px)
    objectness = [o.astype(jnp.float32) for o in objectness]
    box_regression = [r.astype(jnp.float32) for r in box_regression]

    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    for li, (obj, reg) in enumerate(zip(objectness, box_regression)):
        scores, deltas = _flatten_level(obj, reg)
        scores = jax.nn.sigmoid(scores)
        n = scores.shape[1]
        k = min(pre_nms_top_n, n)
        if approx_topk and n > 8192 and k < n:
            # pre-NMS candidate selection over up to ~2e5 anchors per
            # level: lax.approx_max_k lowers to the TPU-native
            # PartialReduce (the sort-based exact top_k costs ~15 ms/step
            # here); non-TPU backends lower it to an exact fallback. At
            # recall 0.95 the (rare) missed candidates sit at the top-2000
            # score cutoff where NMS survival is near zero.
            top_scores, top_idx = jax.lax.approx_max_k(
                scores, k, recall_target=0.95
            )
        else:
            top_scores, top_idx = jax.lax.top_k(scores, k)  # [B, k]
        anchors = jnp.asarray(layout.per_level[li])  # [n, 4]
        top_anchors = anchors[top_idx]  # [B, k, 4]
        top_deltas = jnp.take_along_axis(
            deltas, top_idx[..., None], axis=1
        )  # [B, k, 4]
        proposals = box_coder.decode(top_deltas, top_anchors)  # [B, k, 4]
        proposals = clip_boxes_to_image(
            proposals,
            (image_sizes[:, None, 1], image_sizes[:, None, 0]),  # (w, h)
        )
        ws = proposals[..., 2] - proposals[..., 0] + 1.0
        hs = proposals[..., 3] - proposals[..., 1] + 1.0
        valid = (ws >= min_size) & (hs >= min_size)

        def _nms_one(b, s, v):
            idx, keep = nms(
                b, s, nms_thresh, post_nms_top_n, mask=v
            )
            return b[idx], s[idx], keep

        nb, ns, nv = jax.vmap(_nms_one)(proposals, top_scores, valid)
        lvl_boxes.append(nb)
        lvl_scores.append(ns)
        lvl_valid.append(nv)

    boxes = jnp.concatenate(lvl_boxes, axis=1)  # [B, L*post, 4]
    scores = jnp.concatenate(lvl_scores, axis=1)
    valid = jnp.concatenate(lvl_valid, axis=1)

    if len(objectness) > 1:
        neg_inf = jnp.finfo(scores.dtype).min
        masked = jnp.where(valid, scores, neg_inf)
        if is_train and fpn_post_nms_per_batch:
            # Detectron quirk: train-time topk over the whole *batch*
            # (inference.py:152-163). Keep slots, update validity, then
            # compact per image to fpn_post_nms_top_n slots.
            flat = masked.reshape(-1)
            k = min(fpn_post_nms_top_n, flat.shape[0])
            kth = jax.lax.top_k(flat, k)[0][-1]
            valid = valid & (masked >= kth)
            masked = jnp.where(valid, scores, neg_inf)
        k = min(fpn_post_nms_top_n, masked.shape[1])
        top_scores, top_idx = jax.lax.top_k(masked, k)
        boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        valid = jnp.take_along_axis(valid, top_idx, axis=1)
        scores = jnp.take_along_axis(scores, top_idx, axis=1)

    if is_train and gt_boxes is not None:
        gt_scores = jnp.ones(gt_boxes.shape[:2], scores.dtype)
        boxes = jnp.concatenate([boxes, gt_boxes], axis=1)
        scores = jnp.concatenate([scores, gt_scores], axis=1)
        valid = jnp.concatenate([valid, gt_mask], axis=1)

    return boxes, scores, valid


# --------------------------------------------------------------------------
# Loss (loss.py:18-153)
# --------------------------------------------------------------------------

def rpn_losses(
    layout: AnchorLayout,
    objectness: Sequence[jnp.ndarray],
    box_regression: Sequence[jnp.ndarray],
    image_sizes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    key,
    *,
    fg_iou_threshold: float = 0.7,
    bg_iou_threshold: float = 0.3,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    smooth_l1_beta: float = 1.0 / 9,
    box_coder: Optional[BoxCoder] = None,
):
    """(loss_objectness, loss_rpn_box_reg) with the reference normalization:
    smooth-L1 summed over sampled positives / total sampled; BCE mean over
    sampled (loss.py:115-125). Per-batch totals averaged like torch's
    flattened-cat behavior (sums over images / total sample count).
    """
    if box_coder is None:
        box_coder = BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))
    # losses and box targets in f32 regardless of compute dtype
    objectness = [o.astype(jnp.float32) for o in objectness]
    box_regression = [r.astype(jnp.float32) for r in box_regression]

    anchors = jnp.asarray(layout.all)  # [N, 4]
    obj_flat = jnp.concatenate(
        [_flatten_level(o, r)[0] for o, r in zip(objectness, box_regression)],
        axis=1,
    )  # [B, N]
    reg_flat = jnp.concatenate(
        [_flatten_level(o, r)[1] for o, r in zip(objectness, box_regression)],
        axis=1,
    )  # [B, N, 4]

    quality = box_iou(gt_boxes, anchors[None])  # [B, M, N]
    matches = match_boxes(
        quality, gt_mask, fg_iou_threshold, bg_iou_threshold,
        allow_low_quality_matches=True,
    )  # [B, N]

    labels = (matches >= 0).astype(jnp.float32)
    visibility = layout.visibility(image_sizes)  # [B, N]
    discard = (~visibility) | (matches == BETWEEN_THRESHOLDS)

    # matched GT per anchor as a one-hot matmul instead of a row gather:
    # the [B, 280k] gather costs ~3 ms/step as a kScatter-class custom
    # fusion on TPU, while the [B, N, M] @ [B, M, 4] contraction rides
    # the MXU (gt_boxes carries no gradient, so no transposed scatter)
    M = gt_boxes.shape[1]
    onehot = (
        jnp.maximum(matches, 0)[..., None]
        == jnp.arange(M, dtype=jnp.int32)
    ).astype(jnp.float32)
    matched_gt = jnp.einsum("bnm,bmc->bnc", onehot, gt_boxes)  # [B, N, 4]
    reg_targets = box_coder.encode(matched_gt, anchors[None])

    pos_mask = (labels > 0.5) & ~discard
    neg_mask = (labels < 0.5) & ~discard
    sel_pos, sel_neg = balanced_sample(
        pos_mask, neg_mask, batch_size_per_image, positive_fraction, key
    )
    sampled = sel_pos | sel_neg
    n_sampled = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)

    box_loss = smooth_l1_loss(
        reg_flat,
        reg_targets,
        beta=smooth_l1_beta,
        weights=sel_pos[..., None].astype(reg_flat.dtype),
        normalizer=n_sampled,
    )

    bce = jnp.maximum(obj_flat, 0) - obj_flat * labels + jnp.log1p(
        jnp.exp(-jnp.abs(obj_flat))
    )
    objectness_loss = jnp.sum(bce * sampled.astype(bce.dtype)) / n_sampled

    return objectness_loss, box_loss
