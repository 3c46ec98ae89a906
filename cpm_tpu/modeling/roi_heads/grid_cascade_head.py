"""Grid R-CNN and CPM Grid-Cascade R-CNN head families.

Reference:
  * /root/reference/pet/rcnn/modeling/grid_cascade_rcnn/grid_cascade_rcnn.py
    :15-309 — the CPM model: one cls branch + STAGE_NUM grid stages (CMM),
    ISM IoU branch on the last stage, RSM rescoring head;
  * grid_cascade_rcnn/loss.py — cls CE, per-stage positive-only matching,
    grid BCE x LOSS_WEIGHT x stage weight, ISM L2;
  * grid_cascade_rcnn/inference.py — CLSPostProcessor (per-class expansion
    + ml_nms), GridPostProcessor (heatmap decode + train-time add-GT), RSM
    score fusion score^0.8 * rescore^0.2 (:62-76);
  * grid_rcnn/grid_rcnn.py:15-103 — the single-stage Grid R-CNN family,
    implemented here as the 1-stage configuration of the same machinery.

TPU-native: every stage runs on fixed-size padded roi sets
([B, MAX_SAMPLE_NUM_GRID] for stage 0; +G slots for later stages after
train-time add-GT). The reference's CPU rasterization/decode round trips
are replaced by the vectorized device ops in grid_ops.py. Static python
loop over stages (fixed STAGE_NUM) = XLA unrolled cascade.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling.roi_heads.box_head import Detections, filter_detections
from cpm_tpu.modeling.roi_heads.grid_modules import (
    ClsHead,
    ClsOutput,
    GridHead,
    GridOutput,
)
from cpm_tpu.modeling.roi_heads.grid_ops import (
    better_roi_mask,
    enhance_features,
    extend_rois,
    grid_decode,
    grid_targets,
    random_jitter_boxes,
    resize_large_rois,
)
from cpm_tpu.modeling.roi_heads.targets import (
    assign_targets,
    compact_by_mask,
    rois_with_batch_index,
    subsample_rois,
)
from cpm_tpu.ops.box_coder import BoxCoder
from cpm_tpu.ops.losses import ism_l2_loss, softmax_cross_entropy
from cpm_tpu.ops.pooler import Pooler
from cpm_tpu.structures.boxes import box_iou
from cpm_tpu.utils.matcher import match_boxes
from cpm_tpu.utils.sampler import sample_k_from_mask

# static slice sizes for the bucketed grid towers (train path): the
# smallest bucket covering every valid roi runs; realistic batches
# (~5-14 positives/image) land in the first. Each bucket compiles its
# own tower, so keep the list short.
TOWER_BUCKETS = (16, 48)

# eval-path buckets over the post-NMS detection set (padded to
# GRID_RCNN.TEST_MAX_DETECTIONS): typical images keep well under 100
# detections above the score threshold
EVAL_TOWER_BUCKETS = (32, 128)


def _masked_bce_mean(logits, targets, roi_mask):
    """BCE-with-logits, mean over valid rois' elements
    (loss.py:263: F.binary_cross_entropy_with_logits default mean over the
    variable-size kept roi set)."""
    bce = (
        jnp.maximum(logits, 0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    m = roi_mask.reshape(roi_mask.shape + (1,) * (bce.ndim - 1)).astype(
        bce.dtype
    )
    per_roi_elems = 1
    for d in bce.shape[1:]:
        per_roi_elems *= d
    denom = jnp.maximum(jnp.sum(m) * per_roi_elems, 1.0)
    return jnp.sum(bce * m) / denom


def _gather_rois(boxes, mask, idx):
    g = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    m = jnp.take_along_axis(mask, idx, axis=1)
    return g, m


class GridCascadeRCNNHead(nn.Module):
    """CPM head. With stage_num=1 / no ISM/RSM this is plain Grid R-CNN."""

    cfg: Any

    def setup(self):
        c = self.cfg
        g = c.GRID_RCNN
        self.cascade_on = bool(g.CASCADE_MAPPING_ON)
        opt = g.CASCADE_MAPPING_OPTION
        self.stage_num = opt.STAGE_NUM if self.cascade_on else 1
        self.test_stage = opt.TEST_STAGE if self.cascade_on else 1
        self.stage_weights = (
            tuple(opt.STAGE_WEIGHTS) if self.cascade_on else (1.0,)
        )
        self.mapping_ratios = (
            tuple(opt.STAGE_MAPPING_RATIO) if self.cascade_on else (1.0,)
        )
        self.grid_nums = (
            tuple(opt.GRID_NUM) if self.cascade_on else (g.GRID_POINTS,)
        )
        self.fg_thresholds = (
            tuple(opt.FG_IOU_THRESHOLD)
            if self.cascade_on
            else (g.FG_IOU_THRESHOLD,)
        )
        self.bg_thresholds = (
            tuple(opt.BG_IOU_THRESHOLD)
            if self.cascade_on
            else (g.BG_IOU_THRESHOLD,)
        )

        scales = tuple(
            0.5 ** (c.FPN.ROI_MIN_LEVEL + i)
            for i in range(c.FPN.ROI_MAX_LEVEL - c.FPN.ROI_MIN_LEVEL + 1)
        )
        self.cls_head = ClsHead(
            resolution=tuple(g.ROI_XFORM_RESOLUTION_CLS),
            scales=scales,
            sampling_ratio=g.ROI_XFORM_SAMPLING_RATIO,
            mlp_dim=g.MLP_HEAD.MLP_DIM,
        )
        self.cls_output = ClsOutput(num_classes=c.MODEL.NUM_CLASSES)

        heads, outs = [], []
        for s in range(self.stage_num):
            heads.append(
                GridHead(
                    grid_points=self.grid_nums[s],
                    roi_feat_size=g.ROI_FEAT_SIZE,
                    num_convs=g.GRID_HEAD.NUM_CONVS,
                    point_feat_channels=g.GRID_HEAD.POINT_FEAT_CHANNELS,
                    scales=scales,
                    sampling_ratio=g.ROI_XFORM_SAMPLING_RATIO,
                    fused_on=g.FUSED_ON,
                    finest_level_only=g.FINEST_LEVEL_ROI,
                    offset_on=g.OFFSET_ON,
                    tiled=getattr(c.TPU, "TILED_TOWERS", False),
                    name=f"grid_head_{s}",
                )
            )
            outs.append(
                GridOutput(
                    grid_points=self.grid_nums[s],
                    point_feat_channels=g.GRID_HEAD.POINT_FEAT_CHANNELS,
                    iou_helper=(
                        g.IOU_HELPER and s == self.stage_num - 1
                    ),
                    se_on=g.SE_ON,
                    fused_on=g.FUSED_ON,
                    offset_on=g.OFFSET_ON,
                    tiled=getattr(c.TPU, "TILED_TOWERS", False),
                    name=f"grid_output_{s}",
                )
            )
        self.grid_heads = heads
        self.grid_outputs = outs

        if g.RESCORE_ON:
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

        self.box_coder = BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))

    # ---------------- train ----------------

    def _train_cls(self, features, proposals, prop_mask, gt):
        c = self.cfg
        g = c.GRID_RCNN
        key = self.make_rng("sample")
        sampled = subsample_rois(
            proposals,
            prop_mask,
            gt["boxes"],
            gt["labels"],
            gt["mask"],
            key,
            batch_size_per_image=g.BATCH_SIZE_PER_IMAGE,
            positive_fraction=g.POSITIVE_FRACTION,
            fg_iou_threshold=g.FG_IOU_THRESHOLD,
            bg_iou_threshold=g.BG_IOU_THRESHOLD,
            box_coder=self.box_coder,
        )
        rois = rois_with_batch_index(sampled.boxes)
        x = self.cls_head(features, rois, sampled.mask.reshape(-1))
        logits = self.cls_output(x)
        loss_cls = softmax_cross_entropy(
            logits, sampled.labels.reshape(-1), sampled.mask.reshape(-1)
        )
        return sampled, dict(loss_classifier=loss_cls)

    def _stage_match(self, stage, boxes, mask, gt):
        """Match rois to gt at the stage's thresholds (loss.py:139-161)."""
        quality = box_iou(gt["boxes"], boxes)  # [B, M, S]
        matches = match_boxes(
            quality,
            gt["mask"],
            self.fg_thresholds[stage],
            self.bg_thresholds[stage],
            allow_low_quality_matches=False,
        )
        clamped = jnp.maximum(matches, 0)
        matched_gt = jnp.take_along_axis(
            gt["boxes"], clamped[..., None], axis=1
        )
        matched_iou = jnp.max(
            jnp.where(gt["mask"][:, :, None], quality, 0.0), axis=1
        )
        pos = (matches >= 0) & mask
        return matched_gt, matched_iou, pos

    def _train_cascade(self, features, sampled, gt, image_sizes):
        c = self.cfg
        g = c.GRID_RCNN
        losses = {}
        key = self.make_rng("sample")
        if g.ENHANCE_FEATURES:
            # grid-branch-only cross-level mixing (grid_cascade_rcnn.py:104)
            features = enhance_features(features)
        else:
            n_lvl = c.FPN.ROI_MAX_LEVEL - c.FPN.ROI_MIN_LEVEL + 1
            features = features[:n_lvl]

        # stage-0 input: <=MAX_SAMPLE_NUM_GRID positives of the cls sample
        # (keep_only_positive_boxes, rcnn/utils/misc.py:54-76)
        boxes, mask = sampled.boxes, sampled.mask
        if g.RANDOM_JITTER:
            boxes = random_jitter_boxes(
                boxes, jax.random.fold_in(key, 99), image_sizes[:, None, :]
            )
        pos_mask = sampled.is_pos
        capped = sample_k_from_mask(
            pos_mask, g.MAX_SAMPLE_NUM_GRID, jax.random.fold_in(key, 0)
        )
        idx, mask = compact_by_mask(capped, g.MAX_SAMPLE_NUM_GRID)
        boxes, _ = _gather_rois(boxes, mask, idx)

        for stage in range(self.stage_num):
            matched_gt, matched_iou, stage_mask = self._stage_match(
                stage, boxes, mask, gt
            )
            if stage == 0:
                # stage 0 keeps the full (positive-capped) set
                stage_mask = mask
            if g.BETTER_ROI:
                stage_mask = stage_mask & better_roi_mask(
                    boxes, matched_gt, g.BETTER_ROI_RATIO
                )
            if g.EXTEND_ROI:
                # 2x growth applied after matching, before target prep /
                # pooling / decode (grid_cascade_rcnn.py:140-141: extend
                # runs after subsample and mutates the proposals used
                # downstream)
                boxes = extend_rois(boxes, image_sizes[:, None, :])

            B, S = boxes.shape[:2]

            # ---- bucketed tower: skip the padding's conv work ---------
            # The fixed-shape roi sets here are 85-95% padding on
            # realistic data (~5-14 positives/image vs S=96+), and the
            # 8-conv 576-ch towers are the most expensive compute in the
            # whole step. Re-compact valid rois to a per-image prefix
            # (BETTER_ROI can clear bits inside the old prefix), then run
            # targets+tower+outputs+losses+decode on the smallest static
            # slice [:, :K] covering every valid roi, selected by
            # lax.switch on the measured max count. Pure shape change:
            # the same rois produce the same (masked) losses and decode.
            #
            # Conditional I/O is kept deliberately small: RoI pooling
            # runs at full S OUTSIDE the switch (the Pallas kernel skips
            # masked rois, so padding is nearly free there, and the
            # tens-of-MB FPN maps stay off the branch operand list), and
            # each branch returns only its scalar losses plus the [B,S,4]
            # refined boxes — the 56x56 heatmap logits and targets never
            # cross the conditional boundary in either direction.
            cidx, stage_mask = compact_by_mask(stage_mask, S)
            boxes = jnp.take_along_axis(boxes, cidx[..., None], axis=1)
            matched_gt = jnp.take_along_axis(
                matched_gt, cidx[..., None], axis=1
            )
            matched_iou = jnp.take_along_axis(matched_iou, cidx, axis=1)
            # keep the loop-carried candidate mask aligned with the
            # permuted boxes — the (boxes, mask) pair is returned to the
            # RSM rescore union, which indexes boxes by mask bits
            mask = jnp.take_along_axis(mask, cidx, axis=1)

            gh = self.grid_heads[stage]
            pooler = Pooler(
                output_size=(gh.roi_feat_size, gh.roi_feat_size),
                scales=(
                    (gh.scales[0],)
                    if gh.finest_level_only
                    else tuple(gh.scales)
                ),
                sampling_ratio=gh.sampling_ratio,
            )
            pooled = pooler(
                features[:1] if gh.finest_level_only else features,
                rois_with_batch_index(boxes),
                stage_mask.reshape(B * S),
            )

            last = stage == self.stage_num - 1
            buckets = tuple(
                getattr(c.TPU, "TOWER_BUCKETS", TOWER_BUCKETS)
            )
            k_list = [k for k in buckets if k < S] + [S]
            n_max = jnp.max(jnp.sum(stage_mask.astype(jnp.int32), axis=1))
            b_idx = sum(
                (n_max > k).astype(jnp.int32) for k in k_list[:-1]
            )

            def _make_branch(K):
                def branch(
                    mdl, pooled, boxes, stage_mask, matched_gt, matched_iou
                ):
                    bK = boxes[:, :K].reshape(B * K, 4)
                    mK = stage_mask[:, :K].reshape(B * K)
                    pK = pooled.reshape(B, S, *pooled.shape[1:])[:, :K]
                    pK = pK.reshape(B * K, *pooled.shape[1:])
                    tK = grid_targets(
                        bK,
                        matched_gt[:, :K].reshape(B * K, 4),
                        mK,
                        mapping_ratio=mdl.mapping_ratios[stage],
                        grid_points=mdl.grid_nums[stage],
                        roi_feat_size=g.ROI_FEAT_SIZE,
                        pos_radius=g.POS_RADIUS,
                        target_refine=g.TARGET_REFINE,
                    )
                    x, x_so, x_off = mdl.grid_heads[stage](
                        None, None, mK, pooled=pK
                    )
                    gl, il = mdl.grid_outputs[stage](
                        x, x_so, x_off, train=True
                    )
                    loss_grid = _masked_bce_mean(gl["unfused"], tK, mK)
                    if gl["fused"] is not None and (
                        g.FUSED_ON or g.OFFSET_ON
                    ):
                        loss_grid = loss_grid + _masked_bce_mean(
                            gl["fused"], tK, mK
                        )
                    if g.IOU_HELPER and last:
                        iou_K = matched_iou[:, :K].reshape(B * K)
                        iou_t = jnp.stack([1.0 - iou_K, iou_K], axis=-1)
                        loss_iou = ism_l2_loss(il, iou_t, mK)
                    else:
                        loss_iou = jnp.zeros((), jnp.float32)
                    if not last:
                        # refine proposals from heatmaps under stop-grad
                        # (inference.py:145-166)
                        hm = gl["fused"] if g.FUSED_ON else gl["unfused"]
                        hm = jax.lax.stop_gradient(hm)
                        refined = grid_decode(
                            bK,
                            hm,
                            jnp.repeat(image_sizes, K, axis=0),
                            mapping_ratio=mdl.mapping_ratios[stage],
                            grid_points=mdl.grid_nums[stage],
                            roi_feat_size=g.ROI_FEAT_SIZE,
                        ).reshape(B, K, 4)
                        refined = jnp.pad(
                            refined, ((0, 0), (0, S - K), (0, 0))
                        )
                    else:
                        refined = jnp.zeros((B, S, 4), boxes.dtype)
                    return loss_grid, loss_iou, refined

                return branch

            branch_args = (
                self, pooled, boxes, stage_mask, matched_gt, matched_iou
            )
            if len(k_list) == 1 or self.is_initializing():
                # At init, bypass the lifted switch: flax re-derives the
                # params rng at every lift boundary (nn.switch/nn.remat),
                # so params created inside branches would draw DIFFERENT
                # values than the unbucketed path — fresh-init weights
                # must not depend on the TPU.TOWER_BUCKETS perf knob.
                # The plain full-S call creates them exactly as the
                # unbucketed trace does; apply-time switches reuse them.
                loss_grid, loss_iou, refined = _make_branch(S)(*branch_args)
            else:
                # remat each branch: without it, the switch's VJP unions
                # every branch's residuals (flax GroupNorm saves f32
                # [K,7,7,G,C/G] upcasts per tower conv), and XLA hoists
                # the untaken branches' zero-fills out of the conditional
                # — ~11 ms/step of pure zeroing at realistic density
                # (measured, docs/PROFILE.md round-2 seventh pass). With
                # remat the residual set is just the branch operands, and
                # the backward recomputes the K-sized tower forward
                # (cheap in the small buckets where real data lands).
                # prevent_cse is unnecessary inside a conditional branch.
                loss_grid, loss_iou, refined = nn.switch(
                    b_idx,
                    [
                        nn.remat(_make_branch(k), prevent_cse=False)
                        for k in k_list
                    ],
                    *branch_args,
                )

            losses[f"loss_grid_{stage + 1}"] = (
                g.LOSS_WEIGHT * self.stage_weights[stage] * loss_grid
            )
            if g.IOU_HELPER and last:
                losses[f"loss_iou_{stage + 1}"] = (
                    g.IOU_LOSS_WEIGHT * loss_iou
                )

            if stage < self.stage_num - 1:
                # drop gt-identical rows, re-add gt (inference.py:145-166)
                if self.cascade_on and c.GRID_RCNN.CASCADE_MAPPING_OPTION.RESIZE_ROI:
                    refined = resize_large_rois(refined)

                # _filter_boxes: drop rows equal to any gt box
                eq_gt = jnp.any(
                    jnp.all(
                        jnp.abs(
                            boxes[:, :, None, :] - gt["boxes"][:, None, :, :]
                        )
                        < 1e-5,
                        axis=-1,
                    )
                    & gt["mask"][:, None, :],
                    axis=-1,
                )
                keep = stage_mask & ~eq_gt
                boxes = jnp.concatenate([refined, gt["boxes"]], axis=1)
                mask = jnp.concatenate([keep, gt["mask"]], axis=1)

        return boxes, mask, losses

    def _train_rescore(self, features, cls_sampled, grid_boxes, grid_mask, gt):
        c = self.cfg
        g = c.GRID_RCNN
        # negatives of the cls sample + grid-refined boxes
        # (get_full_sample_boxes, grid_cascade_rcnn.py:231-245)
        neg_mask = cls_sampled.mask & (cls_sampled.labels == 0)
        key = self.make_rng("sample")
        if g.RESCORE_OPTION.KEEP_RATIO:
            # cap negatives at 3x the grid-positive count by random rank
            # (grid_cascade_rcnn.py:237-242: randperm subset of negatives)
            n_pos = jnp.sum(grid_mask.astype(jnp.int32), axis=1, keepdims=True)
            pri = jax.random.uniform(
                jax.random.fold_in(key, 7), neg_mask.shape
            )
            pri = jnp.where(neg_mask, pri, jnp.inf)
            rank = jnp.argsort(jnp.argsort(pri, axis=1), axis=1)
            neg_mask = neg_mask & (rank < 3 * n_pos)
        union_boxes = jnp.concatenate(
            [cls_sampled.boxes, grid_boxes], axis=1
        )
        union_mask = jnp.concatenate([neg_mask, grid_mask], axis=1)
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
            box_coder=self.box_coder,
        )
        rois = rois_with_batch_index(sampled.boxes)
        x = self.rescore_head(features, rois, sampled.mask.reshape(-1))
        logits = self.rescore_output(x)
        loss = softmax_cross_entropy(
            logits, sampled.labels.reshape(-1), sampled.mask.reshape(-1)
        )
        return dict(loss_rescore=g.RESCORE_LOSS_WEIGHT * loss)

    # ---------------- test ----------------

    def _test_cls(self, features, proposals, prop_mask, image_sizes):
        c = self.cfg
        g = c.GRID_RCNN
        B, K = proposals.shape[:2]
        rois = rois_with_batch_index(proposals)
        x = self.cls_head(features, rois, prop_mask.reshape(-1))
        logits = self.cls_output(x)
        probs = jax.nn.softmax(logits, axis=-1).reshape(
            B, K, c.MODEL.NUM_CLASSES
        )
        # CLSPostProcessor: same box for every class, ml_nms 0.3 at 0.03
        boxes_pc = jnp.broadcast_to(
            proposals[:, :, None, :],
            (B, K, c.MODEL.NUM_CLASSES, 4),
        )
        return filter_detections(
            boxes_pc,
            probs,
            prop_mask,
            score_thresh=g.SCORE_THRESH,
            nms_thresh=g.NMS,
            detections_per_img=g.TEST_MAX_DETECTIONS,
        )

    def _test_cascade(self, features, dets: Detections, image_sizes):
        c = self.cfg
        g = c.GRID_RCNN
        if g.ENHANCE_FEATURES:
            features = enhance_features(features)
        else:
            n_lvl = c.FPN.ROI_MAX_LEVEL - c.FPN.ROI_MIN_LEVEL + 1
            features = features[:n_lvl]
        boxes, scores, mask = dets.boxes, dets.scores, dets.mask
        B, S = boxes.shape[:2]
        # ---- bucketed eval towers (same trick as the train path) ----
        # The detection set is padded to TEST_MAX_DETECTIONS and the
        # valid count is usually a small fraction of it. The mask is
        # stage-invariant at eval, so compact ONCE up front (permuting
        # every per-detection field identically — downstream consumers
        # treat Detections as a masked set), then per stage run the
        # tower on the smallest static slice covering every valid det.
        cidx, mask = compact_by_mask(mask, S)
        boxes = jnp.take_along_axis(boxes, cidx[..., None], axis=1)
        scores = jnp.take_along_axis(scores, cidx, axis=1)
        labels = jnp.take_along_axis(dets.labels, cidx, axis=1)
        eval_buckets = tuple(
            getattr(c.TPU, "EVAL_TOWER_BUCKETS", EVAL_TOWER_BUCKETS)
        )
        k_list = [k for k in eval_buckets if k < S] + [S]
        n_max = jnp.max(jnp.sum(mask.astype(jnp.int32), axis=1))
        b_idx = sum((n_max > k).astype(jnp.int32) for k in k_list[:-1])
        # NOTE on TEST_STAGE < STAGE_NUM: the loop runs stages
        # [0, test_stage) and ISM fires only at stage == STAGE_NUM-1 —
        # exactly the reference semantics (grid_cascade_rcnn.py:175-186
        # breaks after the post-processor of stage TEST_STAGE-1, and
        # inference.py:172 gates ISM on the post-processor's stage being
        # STAGE_NUM-1), so ISM never applies when TEST_STAGE < STAGE_NUM.
        for stage in range(self.test_stage):
            if g.EXTEND_ROI:
                # applied per stage before pooling (grid_cascade_rcnn.py
                # :199-200 via _forward_test_grid); the decode below then
                # operates on the extended boxes, as in the reference
                boxes = extend_rois(boxes, image_sizes[:, None, :])

            gh = self.grid_heads[stage]
            pooler = Pooler(
                output_size=(gh.roi_feat_size, gh.roi_feat_size),
                scales=(
                    (gh.scales[0],)
                    if gh.finest_level_only
                    else tuple(gh.scales)
                ),
                sampling_ratio=gh.sampling_ratio,
            )
            pooled = pooler(
                features[:1] if gh.finest_level_only else features,
                rois_with_batch_index(boxes),
                mask.reshape(B * S),
            )
            ism_here = (
                g.IOU_HELPER
                and stage == self.stage_num - 1
                and self.grid_outputs[stage].iou_helper
            )

            def _make_branch(K, stage=stage, ism_here=ism_here):
                def branch(mdl, pooled, boxes, mask):
                    bK = boxes[:, :K].reshape(B * K, 4)
                    mK = mask[:, :K].reshape(B * K)
                    pK = pooled.reshape(B, S, *pooled.shape[1:])[:, :K]
                    pK = pK.reshape(B * K, *pooled.shape[1:])
                    x, x_so, x_off = mdl.grid_heads[stage](
                        None, None, mK, pooled=pK
                    )
                    gl, il = mdl.grid_outputs[stage](
                        x, x_so, x_off, train=False
                    )
                    hm = gl["fused"] if g.FUSED_ON else gl["unfused"]
                    refined = grid_decode(
                        bK,
                        hm,
                        jnp.repeat(image_sizes, K, axis=0),
                        mapping_ratio=mdl.mapping_ratios[stage],
                        grid_points=mdl.grid_nums[stage],
                        roi_feat_size=g.ROI_FEAT_SIZE,
                    ).reshape(B, K, 4)
                    refined = jnp.pad(
                        refined, ((0, 0), (0, S - K), (0, 0))
                    )
                    if ism_here:
                        iou = jnp.pad(
                            il[:, 1].reshape(B, K), ((0, 0), (0, S - K))
                        )
                    else:
                        iou = jnp.zeros((B, S), scores.dtype)
                    return refined, iou

                return branch

            if len(k_list) == 1 or self.is_initializing():
                # init-time bypass of the lifted switch — same rationale
                # as the train path: param values must not depend on the
                # bucket configuration
                refined, iou_score = _make_branch(S)(
                    self, pooled, boxes, mask
                )
            else:
                refined, iou_score = nn.switch(
                    b_idx,
                    [_make_branch(k) for k in k_list],
                    self,
                    pooled,
                    boxes,
                    mask,
                )

            if ism_here:
                if g.IOU_HELPER_MERGE:
                    scores = scores * iou_score
                else:
                    scores = iou_score
                scores = jnp.where(mask, scores, 0.0)
            boxes = refined
        return Detections(
            boxes=boxes, scores=scores, labels=labels, mask=mask
        )

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
        # score^0.8 * rescore^0.2 (inference.py:62-76)
        fused = jnp.clip(dets.scores, 0.0) ** 0.8 * jnp.clip(
            rescores, 1e-12
        ) ** 0.2
        fused = jnp.where(dets.mask, fused, 0.0)
        return dets._replace(scores=fused)

    # ---------------- forward ----------------

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
        g = c.GRID_RCNN
        # cls/rescore branches pool over the RoI levels only; the cascade
        # keeps the full level list for ENHANCE_FEATURES (P6 mixes into P5)
        n_lvl = c.FPN.ROI_MAX_LEVEL - c.FPN.ROI_MIN_LEVEL + 1
        roi_feats = features[:n_lvl]
        if train:
            losses = {}
            sampled, loss_cls = self._train_cls(
                roi_feats, proposals, prop_mask, gt
            )
            grid_boxes, grid_mask, loss_grid = self._train_cascade(
                features, sampled, gt, image_sizes
            )
            losses.update(loss_cls)
            losses.update(loss_grid)
            if g.RESCORE_ON:
                losses.update(
                    self._train_rescore(
                        roi_feats, sampled, grid_boxes, grid_mask, gt
                    )
                )
            return losses

        dets = self._test_cls(roi_feats, proposals, prop_mask, image_sizes)
        dets = self._test_cascade(features, dets, image_sizes)
        if g.RESCORE_ON:
            dets = self._test_rescore(roi_feats, dets)
        return dets


class GridRCNNHead(GridCascadeRCNNHead):
    """Single-stage Grid R-CNN (grid_rcnn/grid_rcnn.py) — the same
    machinery with one stage, mapping ratio 1, GRID_POINTS points."""
    pass
