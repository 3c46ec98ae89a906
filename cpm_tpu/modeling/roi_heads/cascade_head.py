"""Cascade R-CNN head family.

Reference: /root/reference/pet/rcnn/modeling/cascade_rcnn/ —
cascade_rcnn.py:16-144 (N stages at rising IoU thresholds with per-stage
BBOX_REG_WEIGHTS and loss weights, test-time score ensemble = mean of
stage logits), loss.py (per-stage subsample + CE + class-agnostic
smooth-L1), inference.py (between-stage class-agnostic decode, drop
gt/degenerate rows, re-add gt at train; optional ISM IoU branch on the
last stage and RSM rescoring reusing the grid-cascade machinery).

TPU-native: fixed [B, S] sampled sets per stage, train-time inter-stage
refinement under stop-gradient, static unrolled stage loop.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling import initializers as init_scheme
from cpm_tpu.modeling.ws import maybe_ws
from cpm_tpu.modeling.roi_heads.box_head import (
    Detections,
    TwoMLPHead,
    ConvFCHead,
    decode_boxes_per_class,
    fast_rcnn_losses,
    filter_detections,
)
from cpm_tpu.modeling.roi_heads.grid_modules import ClsHead, ClsOutput
from cpm_tpu.modeling.roi_heads.targets import (
    rois_with_batch_index,
    subsample_rois,
)
from cpm_tpu.ops.box_coder import BoxCoder
from cpm_tpu.ops.losses import l2_loss, softmax_cross_entropy


class CascadeStageOutput(nn.Module):
    """cls + box deltas + optional ISM IoU branch (outputs.py:13-57)."""

    num_classes: int
    cls_agnostic_bbox_reg: bool = True
    iou_helper: bool = False

    @nn.compact
    def __call__(self, x):
        cls_score = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        n_box = 8 if self.cls_agnostic_bbox_reg else 4 * self.num_classes
        bbox_pred = nn.Dense(
            n_box, kernel_init=nn.initializers.normal(0.001), name="bbox_pred"
        )(x)
        iou_logits = None
        if self.iou_helper:
            h = nn.relu(nn.Dense(
                1024, kernel_init=init_scheme.mlp_fc(), name="iou_fc1"
            )(x))
            h = nn.relu(nn.Dense(
                1024, kernel_init=init_scheme.mlp_fc(), name="iou_fc2"
            )(h))
            iou_logits = nn.Dense(
                2, kernel_init=nn.initializers.normal(0.01), name="iou_pred"
            )(h)
        return cls_score, bbox_pred, iou_logits


class CascadeRCNNHead(nn.Module):
    cfg: Any

    def setup(self):
        c = self.cfg
        cc = c.CASCADE_RCNN
        self.num_stage = cc.NUM_STAGE
        self.test_stage = cc.TEST_STAGE
        self.stage_weights = tuple(cc.STAGE_WEIGHTS)
        self.fg_thresholds = tuple(cc.FG_IOU_THRESHOLD)
        self.bg_thresholds = tuple(cc.BG_IOU_THRESHOLD)
        self.test_ensemble = bool(cc.TEST_ENSEMBLE)
        self.box_coders = tuple(
            BoxCoder(weights=tuple(w)) for w in cc.BBOX_REG_WEIGHTS
        )

        scales = tuple(
            0.5 ** (c.FPN.ROI_MIN_LEVEL + i)
            for i in range(c.FPN.ROI_MAX_LEVEL - c.FPN.ROI_MIN_LEVEL + 1)
        )
        head_kw = dict(
            resolution=tuple(c.FAST_RCNN.ROI_XFORM_RESOLUTION),
            scales=scales,
            sampling_ratio=c.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
        )
        head_cls = (
            TwoMLPHead  # USE_WS is a no-op on the conv-less MLP head,
            # as in the reference (cascade_rcnn/heads/mlp_heads.py:38)
            if cc.ROI_BOX_HEAD == "roi_2mlp_head"
            else maybe_ws(ConvFCHead, c.FAST_RCNN.CONVFC_HEAD.USE_WS)
        )
        heads, outs = [], []
        for s in range(self.num_stage):
            heads.append(head_cls(**head_kw, name=f"box_head_{s}"))
            outs.append(
                CascadeStageOutput(
                    num_classes=c.MODEL.NUM_CLASSES,
                    cls_agnostic_bbox_reg=c.MODEL.CLS_AGNOSTIC_BBOX_REG,
                    iou_helper=(
                        cc.IOU_HELPER and s == self.num_stage - 1
                    ),
                    name=f"output_{s}",
                )
            )
        self.stage_heads = heads
        self.stage_outputs = outs

        if cc.RESCORE_ON:
            g = c.GRID_RCNN
            self.rescore_head = ClsHead(
                resolution=tuple(g.ROI_XFORM_RESOLUTION_CLS),
                scales=scales,
                sampling_ratio=g.ROI_XFORM_SAMPLING_RATIO,
                mlp_dim=g.MLP_HEAD.MLP_DIM,
                name="rescore_head",
            )
            self.rescore_output = ClsOutput(
                num_classes=c.MODEL.NUM_CLASSES, name="rescore_output"
            )

    def _decode_agnostic(self, box_reg, boxes, stage):
        """Class-agnostic refinement decode (inference.py:66-70, fg cols)."""
        return self.box_coders[stage].decode(box_reg[..., 4:8], boxes)

    def __call__(
        self,
        features,
        proposals,
        prop_mask,
        image_sizes,
        gt: Optional[dict] = None,
        train: bool = False,
    ):
        c = self.cfg
        cc = c.CASCADE_RCNN
        n_lvl = c.FPN.ROI_MAX_LEVEL - c.FPN.ROI_MIN_LEVEL + 1
        features = features[:n_lvl]
        if train:
            return self._forward_train(
                features, proposals, prop_mask, image_sizes, gt
            )
        return self._forward_test(features, proposals, prop_mask, image_sizes)

    def _forward_train(self, features, proposals, prop_mask, image_sizes, gt):
        c = self.cfg
        cc = c.CASCADE_RCNN
        losses = {}
        boxes, mask = proposals, prop_mask
        stage0_sampled = None
        final_sampled = None
        for s in range(self.num_stage):
            key = self.make_rng("sample")
            sampled = subsample_rois(
                jax.lax.stop_gradient(boxes),
                mask,
                gt["boxes"],
                gt["labels"],
                gt["mask"],
                key,
                batch_size_per_image=c.FAST_RCNN.BATCH_SIZE_PER_IMAGE,
                positive_fraction=c.FAST_RCNN.POSITIVE_FRACTION,
                fg_iou_threshold=self.fg_thresholds[s],
                bg_iou_threshold=self.bg_thresholds[s],
                box_coder=self.box_coders[s],
            )
            if s == 0:
                stage0_sampled = sampled
            final_sampled = sampled
            rois = rois_with_batch_index(sampled.boxes)
            x = self.stage_heads[s](features, rois, sampled.mask.reshape(-1))
            cls_logits, box_reg, iou_logits = self.stage_outputs[s](x)
            loss_cls, loss_box = fast_rcnn_losses(
                cls_logits,
                box_reg,
                sampled.labels.reshape(-1),
                sampled.reg_targets.reshape(-1, 4),
                sampled.mask.reshape(-1).astype(cls_logits.dtype),
                smooth_l1_beta=c.FAST_RCNN.SMOOTH_L1_BETA,
                cls_agnostic_bbox_reg=c.MODEL.CLS_AGNOSTIC_BBOX_REG,
            )
            w = self.stage_weights[s]
            losses[f"s{s + 1}_cls_loss"] = loss_cls * w
            losses[f"s{s + 1}_bbox_loss"] = loss_box * w

            if cc.IOU_HELPER and s == self.num_stage - 1 and iou_logits is not None:
                iou_t = jnp.stack(
                    [1.0 - sampled.matched_iou, sampled.matched_iou], axis=-1
                ).reshape(-1, 2)
                losses[f"loss_iou_{self.num_stage}"] = (
                    cc.IOU_LOSS_WEIGHT
                    * l2_loss(
                        iou_logits, iou_t,
                        mask=sampled.mask.reshape(-1)[:, None],
                    )
                )

            if s < self.num_stage - 1:
                # refine: decode class-agnostic deltas, drop rows equal to
                # gt or degenerate, re-add gt (inference.py refine:100-133)
                refined = self._decode_agnostic(
                    jax.lax.stop_gradient(box_reg).reshape(
                        sampled.boxes.shape[:2] + (-1,)
                    ),
                    sampled.boxes,
                    s,
                )
                ws = refined[..., 2] - refined[..., 0] + 1.0
                hs = refined[..., 3] - refined[..., 1] + 1.0
                ok = (ws > 0) & (hs > 0)
                eq_gt = jnp.any(
                    jnp.all(
                        jnp.abs(
                            sampled.boxes[:, :, None, :]
                            - gt["boxes"][:, None, :, :]
                        )
                        < 1e-5,
                        axis=-1,
                    )
                    & gt["mask"][:, None, :],
                    axis=-1,
                )
                keep = sampled.mask & ok & ~eq_gt
                boxes = jnp.concatenate([refined, gt["boxes"]], axis=1)
                mask = jnp.concatenate([keep, gt["mask"]], axis=1)

        if cc.RESCORE_ON:
            losses.update(
                self._train_rescore(
                    features, stage0_sampled, final_sampled, gt
                )
            )
        return losses

    def _train_rescore(self, features, cls_sampled, final_sampled, gt):
        c = self.cfg
        cc = c.CASCADE_RCNN
        neg_mask = cls_sampled.mask & (cls_sampled.labels == 0)
        union_boxes = jnp.concatenate(
            [cls_sampled.boxes, final_sampled.boxes], axis=1
        )
        union_mask = jnp.concatenate(
            [neg_mask, final_sampled.mask & (final_sampled.labels > 0)],
            axis=1,
        )
        key = self.make_rng("sample")
        g = c.GRID_RCNN
        sampled = subsample_rois(
            union_boxes,
            union_mask,
            gt["boxes"],
            gt["labels"],
            gt["mask"],
            key,
            batch_size_per_image=g.BATCH_SIZE_PER_IMAGE,
            positive_fraction=g.POSITIVE_FRACTION,
            fg_iou_threshold=g.FG_IOU_THRESHOLD,
            bg_iou_threshold=g.BG_IOU_THRESHOLD,
            box_coder=self.box_coders[0],
        )
        rois = rois_with_batch_index(sampled.boxes)
        x = self.rescore_head(features, rois, sampled.mask.reshape(-1))
        logits = self.rescore_output(x)
        loss = softmax_cross_entropy(
            logits, sampled.labels.reshape(-1), sampled.mask.reshape(-1)
        )
        return dict(loss_rescore=cc.RESCORE_LOSS_WEIGHT * loss)

    def _forward_test(self, features, proposals, prop_mask, image_sizes):
        c = self.cfg
        cc = c.CASCADE_RCNN
        B, K = proposals.shape[:2]
        boxes, mask = proposals, prop_mask
        ms_logits = []
        for s in range(self.test_stage):
            rois = rois_with_batch_index(boxes)
            x = self.stage_heads[s](features, rois, mask.reshape(-1))
            cls_logits, box_reg, iou_logits = self.stage_outputs[s](x)
            ms_logits.append(cls_logits)
            if s < self.test_stage - 1:
                boxes = self._decode_agnostic(
                    box_reg.reshape(B, K, -1), boxes, s
                )
            else:
                if self.test_ensemble:
                    cls_logits = sum(ms_logits) / len(ms_logits)
                probs = jax.nn.softmax(cls_logits, axis=-1).reshape(
                    B, K, c.MODEL.NUM_CLASSES
                )
                if (
                    cc.IOU_HELPER
                    and s == self.num_stage - 1
                    and iou_logits is not None
                ):
                    iou_score = iou_logits[:, 1].reshape(B, K, 1)
                    if cc.IOU_HELPER_MERGE:
                        probs = probs * iou_score
                    else:
                        probs = jnp.broadcast_to(
                            iou_score, probs.shape
                        )
                boxes_pc = decode_boxes_per_class(
                    box_reg.reshape(B, K, -1),
                    boxes,
                    image_sizes,
                    self.box_coders[s],
                    c.MODEL.NUM_CLASSES,
                    c.MODEL.CLS_AGNOSTIC_BBOX_REG,
                )
                dets = filter_detections(
                    boxes_pc,
                    probs,
                    mask,
                    score_thresh=c.FAST_RCNN.SCORE_THRESH,
                    nms_thresh=c.FAST_RCNN.NMS,
                    detections_per_img=c.FAST_RCNN.DETECTIONS_PER_IMG,
                    use_soft_nms=c.TEST.SOFT_NMS.ENABLED,
                    soft_nms_sigma=c.TEST.SOFT_NMS.SIGMA,
                    soft_nms_method=c.TEST.SOFT_NMS.METHOD,
                    use_box_voting=c.TEST.BBOX_VOTE.ENABLED,
                    vote_thresh=c.TEST.BBOX_VOTE.VOTE_TH,
                    vote_scoring_method=c.TEST.BBOX_VOTE.SCORING_METHOD,
                    vote_beta=c.TEST.BBOX_VOTE.SCORING_METHOD_BETA,
                )
                if cc.RESCORE_ON:
                    dets = self._test_rescore(features, dets)
                return dets

    def _test_rescore(self, features, dets: Detections):
        c = self.cfg
        B, S = dets.boxes.shape[:2]
        rois = rois_with_batch_index(dets.boxes)
        x = self.rescore_head(features, rois, dets.mask.reshape(-1))
        logits = self.rescore_output(x)
        probs = jax.nn.softmax(logits, axis=-1).reshape(
            B, S, c.MODEL.NUM_CLASSES
        )
        rescores = jnp.take_along_axis(
            probs, dets.labels[..., None], axis=-1
        )[..., 0]
        fused = jnp.clip(dets.scores, 0.0) ** 0.8 * jnp.clip(
            rescores, 1e-12
        ) ** 0.2
        return dets._replace(scores=jnp.where(dets.mask, fused, 0.0))
