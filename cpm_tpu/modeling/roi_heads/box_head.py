"""Fast R-CNN box head family: feature extractors, outputs, loss, inference.

Reference: /root/reference/pet/rcnn/modeling/fast_rcnn/ —
  * roi_2mlp_head (heads/mlp_heads.py:13-48): RoIAlign -> 2 FC(1024);
  * roi_xconv1fc_head (heads/convfc_heads.py): N convs -> 1 FC;
  * Box_output (outputs.py:12-40): linear cls + per-class box deltas;
  * loss (loss.py:119-166): CE over sampled rois + smooth-L1 on positives
    with per-class box columns, normalized by total sampled count;
  * PostProcessor (inference.py:12-183): softmax -> per-class decode ->
    clip -> score threshold -> per-class NMS -> top DETECTIONS_PER_IMG.

TPU-native: fixed [B, S] sampled roi sets, masked losses with true-count
normalization, and a fixed-output multiclass NMS (top-M candidate gather +
label-offset NMS) replacing the per-class python loop.
"""

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling import initializers as init_scheme
from cpm_tpu.modeling import registry
from cpm_tpu.ops.box_coder import BoxCoder
from cpm_tpu.ops.losses import smooth_l1_loss, softmax_cross_entropy
from cpm_tpu.ops.nms import batched_nms, soft_nms
from cpm_tpu.ops.pooler import Pooler
from cpm_tpu.structures.boxes import clip_boxes_to_image


# --------------------------------------------------------------------------
# Feature extractors
# --------------------------------------------------------------------------

@registry.ROI_BOX_HEADS.register("roi_2mlp_head")
class TwoMLPHead(nn.Module):
    """RoIAlign -> flatten -> fc6 -> fc7 (mlp_heads.py:13-48)."""

    resolution: Sequence[int] = (7, 7)
    scales: Sequence[float] = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 0
    mlp_dim: int = 1024

    @nn.compact
    def __call__(self, features, rois, roi_mask=None):
        pooler = Pooler(
            output_size=tuple(self.resolution),
            scales=tuple(self.scales),
            sampling_ratio=self.sampling_ratio,
        )
        x = pooler(features, rois, roi_mask)  # [R, ph, pw, C]
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(
            self.mlp_dim, kernel_init=init_scheme.mlp_fc(), name="fc6"
        )(x))
        x = nn.relu(nn.Dense(
            self.mlp_dim, kernel_init=init_scheme.mlp_fc(), name="fc7"
        )(x))
        return x


@registry.ROI_BOX_HEADS.register("roi_xconv1fc_head")
class ConvFCHead(nn.Module):
    """N stacked 3x3 convs -> 1 FC (convfc_heads.py)."""

    resolution: Sequence[int] = (7, 7)
    scales: Sequence[float] = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 0
    conv_dim: int = 256
    num_stacked_convs: int = 4
    mlp_dim: int = 1024
    dilation: int = 1

    @nn.compact
    def __call__(self, features, rois, roi_mask=None):
        pooler = Pooler(
            output_size=tuple(self.resolution),
            scales=tuple(self.scales),
            sampling_ratio=self.sampling_ratio,
        )
        x = pooler(features, rois, roi_mask)
        for i in range(self.num_stacked_convs):
            x = nn.Conv(
                self.conv_dim,
                (3, 3),
                padding=self.dilation,
                kernel_dilation=(self.dilation, self.dilation),
                kernel_init=init_scheme.tower_conv(),
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(
            self.mlp_dim, kernel_init=init_scheme.mlp_fc(), name="fc"
        )(x))
        return x


# --------------------------------------------------------------------------
# Output layer
# --------------------------------------------------------------------------

@registry.ROI_BOX_OUTPUTS.register("Box_output")
class BoxOutput(nn.Module):
    """Linear cls (C) + box deltas (4C, or 8 if class-agnostic)."""

    num_classes: int
    cls_agnostic_bbox_reg: bool = False

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:
            # 4D head features (resnet_c5_head): global average pool +
            # flatten, the reference's adaptive_avg_pool2d(1)
            # (fast_rcnn/outputs.py:33-37)
            x = jnp.mean(x, axis=(1, 2))
        cls_score = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        n_box = 8 if self.cls_agnostic_bbox_reg else 4 * self.num_classes
        bbox_pred = nn.Dense(
            n_box,
            kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred",
        )(x)
        # logits/deltas upcast to f32: decode + losses are
        # precision-sensitive under bf16 compute
        return cls_score.astype(jnp.float32), bbox_pred.astype(jnp.float32)


# --------------------------------------------------------------------------
# Loss (loss.py:119-166)
# --------------------------------------------------------------------------

def fast_rcnn_losses(
    class_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    labels: jnp.ndarray,
    reg_targets: jnp.ndarray,
    sample_mask: jnp.ndarray,
    *,
    smooth_l1_beta: float = 1.0,
    cls_agnostic_bbox_reg: bool = False,
):
    """(loss_classifier, loss_box_reg).

    class_logits [N, C]; box_regression [N, 4C or 8]; labels [N] int
    (0 = bg); reg_targets [N, 4]; sample_mask [N] selects real sampled rois.
    CE is a mean over sampled; box loss is summed over positives' own class
    columns / total sampled (loss.py:149-162).
    """
    n_sampled = jnp.maximum(jnp.sum(sample_mask.astype(jnp.float32)), 1.0)
    safe_labels = jnp.maximum(labels, 0)
    loss_cls = softmax_cross_entropy(
        class_logits, labels, sample_mask.astype(bool)
    )

    pos = sample_mask * (labels > 0)
    if cls_agnostic_bbox_reg:
        pred = box_regression[:, 4:8]
    else:
        col = 4 * safe_labels[:, None] + jnp.arange(4)[None, :]
        pred = jnp.take_along_axis(box_regression, col, axis=1)
    loss_box = smooth_l1_loss(
        pred,
        reg_targets,
        beta=smooth_l1_beta,
        weights=pos[:, None],
        normalizer=n_sampled,
    )
    return loss_cls, loss_box


# --------------------------------------------------------------------------
# Inference (inference.py:105-164 / core/test.py:433-509 ml_nms fast path)
# --------------------------------------------------------------------------

class Detections(NamedTuple):
    boxes: jnp.ndarray   # [B, D, 4]
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D] int32 (1-based classes)
    mask: jnp.ndarray    # [B, D]


def decode_boxes_per_class(
    box_regression: jnp.ndarray,
    proposals: jnp.ndarray,
    image_sizes: jnp.ndarray,
    box_coder: BoxCoder,
    num_classes: int,
    cls_agnostic_bbox_reg: bool = False,
) -> jnp.ndarray:
    """[B, K, 4C] deltas + [B, K, 4] proposals -> clipped [B, K, C, 4]."""
    if cls_agnostic_bbox_reg:
        decoded = box_coder.decode(box_regression[..., 4:8], proposals)
        decoded = jnp.tile(decoded, (1, 1, num_classes))
    else:
        decoded = box_coder.decode(box_regression, proposals)  # [B, K, 4C]
    B, K = decoded.shape[:2]
    decoded = decoded.reshape(B, K, num_classes, 4)
    return clip_boxes_to_image(
        decoded,
        (
            image_sizes[:, None, None, 1].astype(decoded.dtype),
            image_sizes[:, None, None, 0].astype(decoded.dtype),
        ),
    )


def filter_detections(
    boxes_per_class: jnp.ndarray,
    scores: jnp.ndarray,
    prop_mask: jnp.ndarray,
    *,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    pre_nms_candidates: int = 1024,
    use_soft_nms: bool = False,
    soft_nms_sigma: float = 0.5,
    soft_nms_method: str = "linear",
    use_box_voting: bool = False,
    vote_thresh: float = 0.8,
    vote_scoring_method: str = "ID",
    vote_beta: float = 1.0,
) -> Detections:
    """Fixed-shape multiclass filtering.

    boxes_per_class: [B, K, C, 4]; scores: [B, K, C] softmax probs
    (class 0 = background, skipped). Per image: threshold -> top-M
    candidate gather -> label-aware NMS (the ml_nms fast path of
    core/test.py:433-470) -> top detections_per_img.
    """
    B, K, C = scores.shape
    fg = scores[:, :, 1:]                        # [B, K, C-1]
    fgb = boxes_per_class[:, :, 1:, :]
    cand_scores = fg.reshape(B, K * (C - 1))
    cand_boxes = fgb.reshape(B, K * (C - 1), 4)
    cand_labels = jnp.broadcast_to(
        jnp.arange(1, C, dtype=jnp.int32)[None, None, :], (B, K, C - 1)
    ).reshape(B, K * (C - 1))
    cand_valid = (
        (cand_scores > score_thresh)
        & jnp.repeat(prop_mask, C - 1, axis=1)
    )

    M = min(pre_nms_candidates, cand_scores.shape[1])
    neg_inf = jnp.finfo(cand_scores.dtype).min
    masked = jnp.where(cand_valid, cand_scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(masked, M)
    top_boxes = jnp.take_along_axis(cand_boxes, top_idx[..., None], axis=1)
    top_labels = jnp.take_along_axis(cand_labels, top_idx, axis=1)
    top_valid = jnp.take_along_axis(cand_valid, top_idx, axis=1)
    top_scores = jnp.where(top_valid, top_scores, 0.0)

    if use_soft_nms:
        def _one(b, s, l, v):
            # label-aware via the coordinate-offset trick: boxes of
            # different classes never overlap, matching the reference's
            # per-class soft-NMS loop (inference.py:118-136).
            max_coord = jnp.max(jnp.where(v[:, None], b, 0.0)) + 1.0
            shifted = b + (l.astype(b.dtype) * max_coord)[:, None]
            idx, new_scores, keep = soft_nms(
                shifted, s, detections_per_img, sigma=soft_nms_sigma,
                overlap_thresh=nms_thresh, score_thresh=1e-4,
                method=soft_nms_method, mask=v,
            )
            return b[idx], new_scores, l[idx], keep
    else:
        def _one(b, s, l, v):
            idx, keep = batched_nms(
                b, s, l, nms_thresh, detections_per_img, mask=v
            )
            return b[idx], s[idx], l[idx], keep

    db, ds, dl, dm = jax.vmap(_one)(
        top_boxes, top_scores, top_labels, top_valid
    )
    ds = jnp.where(dm, ds, 0.0)

    if use_box_voting:
        # refine kept boxes against the pre-NMS candidate pool
        # (boxlist_box_voting, inference.py:137-144)
        from cpm_tpu.ops.nms import box_ml_voting

        def _vote(kb, ks, kl, km, pb, ps, pl, pv):
            voted, vscores = box_ml_voting(
                kb, ks, kl, pb, ps, pl, vote_thresh,
                scoring_method=vote_scoring_method, beta=vote_beta,
                top_mask=km, pool_mask=pv,
            )
            return voted, vscores

        vb, vs = jax.vmap(_vote)(
            db, ds, dl, dm, top_boxes, top_scores, top_labels, top_valid
        )
        db = jnp.where(dm[..., None], vb, db)
        ds = jnp.where(dm, vs, ds)

    return Detections(boxes=db, scores=ds, labels=dl, mask=dm)
