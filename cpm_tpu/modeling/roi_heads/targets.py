"""Shared RoI target assignment: match -> label -> sample -> compact.

Reference semantics: FastRCNNLossComputation.prepare_targets/subsample
(/root/reference/pet/rcnn/modeling/fast_rcnn/loss.py:52-117) — match
proposals to gt at (fg, bg) IoU thresholds without low-quality recovery,
label background/ignored, balanced-sample BATCH_SIZE_PER_IMAGE at
POSITIVE_FRACTION, then keep only the sampled proposals.

TPU-native: all fixed shapes. The variable-size "keep only sampled" gather
becomes a compaction: sampled slots are argsorted to the front and the
output is a static [B, S] subset (S = batch_size_per_image) plus a validity
mask, so downstream RoIAlign cost is fixed at S rois per image.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cpm_tpu.ops.box_coder import BoxCoder
from cpm_tpu.structures.boxes import box_iou
from cpm_tpu.utils.matcher import (
    BELOW_LOW_THRESHOLD,
    BETWEEN_THRESHOLDS,
    match_boxes,
)
from cpm_tpu.utils.sampler import balanced_sample


class SampledRois(NamedTuple):
    """A fixed-size per-image set of training rois."""

    boxes: jnp.ndarray        # [B, S, 4]
    mask: jnp.ndarray         # [B, S] sampled-slot validity
    labels: jnp.ndarray       # [B, S] int32; 0 = background
    reg_targets: jnp.ndarray  # [B, S, 4] box-coder deltas to matched gt
    matched_gt: jnp.ndarray   # [B, S, 4] matched gt box (for grid targets)
    matched_iou: jnp.ndarray  # [B, S] IoU with matched gt (for ISM targets)
    is_pos: jnp.ndarray       # [B, S] bool


def compact_by_mask(select: jnp.ndarray, out_size: int):
    """Indices that move `select`-True slots to the front, truncated/padded
    to out_size. Returns (idx [..., out_size] int32, valid [..., out_size]).
    Stable: preserves original slot order among selected.
    """
    order = jnp.argsort(~select, axis=-1, stable=True)  # True slots first
    idx = order[..., :out_size].astype(jnp.int32)
    valid = jnp.take_along_axis(select, order, axis=-1)[..., :out_size]
    return idx, valid


def assign_targets(
    proposals: jnp.ndarray,
    prop_mask: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    *,
    fg_iou_threshold: float,
    bg_iou_threshold: float,
    box_coder: BoxCoder,
    allow_low_quality_matches: bool = False,
):
    """Per-proposal labels / regression targets / matched gt.

    Returns dict of [B, K] / [B, K, 4] arrays; label -1 marks ignored
    (between thresholds) and invalid proposal slots.
    """
    quality = box_iou(gt_boxes, proposals)  # [B, M, K]
    matches = match_boxes(
        quality, gt_mask, fg_iou_threshold, bg_iou_threshold,
        allow_low_quality_matches=allow_low_quality_matches,
    )  # [B, K]
    clamped = jnp.maximum(matches, 0)
    matched_gt = jnp.take_along_axis(
        gt_boxes, clamped[..., None], axis=1
    )  # [B, K, 4]
    matched_labels = jnp.take_along_axis(gt_labels, clamped, axis=1)
    matched_iou = jnp.max(
        jnp.where(gt_mask[:, :, None], quality, 0.0), axis=1
    )  # [B, K]
    matched_iou = jnp.where(prop_mask, matched_iou, 0.0)

    labels = matched_labels.astype(jnp.int32)
    labels = jnp.where(matches == BELOW_LOW_THRESHOLD, 0, labels)
    labels = jnp.where(matches == BETWEEN_THRESHOLDS, -1, labels)
    labels = jnp.where(prop_mask, labels, -1)

    reg_targets = box_coder.encode(matched_gt, proposals)
    return dict(
        labels=labels,
        reg_targets=reg_targets,
        matched_gt=matched_gt,
        matched_iou=matched_iou,
    )


def subsample_rois(
    proposals: jnp.ndarray,
    prop_mask: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    key,
    *,
    batch_size_per_image: int,
    positive_fraction: float,
    fg_iou_threshold: float,
    bg_iou_threshold: float,
    box_coder: BoxCoder,
) -> SampledRois:
    """Balanced-sample a fixed [B, S] roi set (loss.py:84-117)."""
    t = assign_targets(
        proposals, prop_mask, gt_boxes, gt_labels, gt_mask,
        fg_iou_threshold=fg_iou_threshold,
        bg_iou_threshold=bg_iou_threshold,
        box_coder=box_coder,
    )
    labels = t["labels"]
    pos_mask = labels > 0
    neg_mask = labels == 0
    sel_pos, sel_neg = balanced_sample(
        pos_mask, neg_mask, batch_size_per_image, positive_fraction, key
    )
    selected = sel_pos | sel_neg
    idx, valid = compact_by_mask(selected, batch_size_per_image)

    gather = lambda a: jnp.take_along_axis(
        a, idx.reshape(idx.shape + (1,) * (a.ndim - 2)), axis=1
    )
    boxes_s = gather(proposals)
    labels_s = jnp.where(valid, jnp.take_along_axis(labels, idx, axis=1), -1)
    return SampledRois(
        boxes=boxes_s,
        mask=valid,
        labels=labels_s,
        reg_targets=gather(t["reg_targets"]),
        matched_gt=gather(t["matched_gt"]),
        matched_iou=jnp.take_along_axis(t["matched_iou"], idx, axis=1),
        is_pos=jnp.take_along_axis(sel_pos, idx, axis=1) & valid,
    )


def rois_with_batch_index(boxes: jnp.ndarray) -> jnp.ndarray:
    """[B, S, 4] -> [B*S, 5] (batch_idx, x1, y1, x2, y2) for the pooler."""
    B, S = boxes.shape[:2]
    bidx = jnp.broadcast_to(
        jnp.arange(B, dtype=boxes.dtype)[:, None], (B, S)
    ).reshape(-1, 1)
    return jnp.concatenate([bidx, boxes.reshape(B * S, 4)], axis=1)
