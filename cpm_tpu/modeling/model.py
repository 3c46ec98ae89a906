"""Generalized R-CNN model builder.

Parity with /root/reference/pet/rcnn/modeling/model_builder.py:19-195: wires
Conv_Body -> FPN -> RPN -> one RoI-head family chosen by config flags
(:31-59, dispatch map in SURVEY §3.3). Train forward returns a loss dict;
test forward returns fixed-shape Detections.

TPU-native: one Flax module; the whole forward (train step and test step)
is jittable with static shapes. Batched images arrive padded (ImageBatch),
ground truth arrives as padded [B, G, ...] arrays with masks. Sampling
randomness comes from the flax 'sample' RNG stream.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling import registry
from cpm_tpu.modeling.ws import maybe_ws
import cpm_tpu.modeling.backbone  # noqa: F401  (registers backbones)
import cpm_tpu.modeling.roi_heads.c4_heads  # noqa: F401  (registers C4 heads)
import cpm_tpu.modeling.necks_extra  # noqa: F401  (registers hrfpn/nasfpn/bifpn)
from cpm_tpu.modeling.fpn import get_min_max_levels
from cpm_tpu.modeling.roi_heads.box_head import (
    BoxOutput,
    Detections,
    decode_boxes_per_class,
    fast_rcnn_losses,
    filter_detections,
)
from cpm_tpu.modeling.roi_heads.targets import (
    rois_with_batch_index,
    subsample_rois,
)
from cpm_tpu.modeling.rpn import (
    AnchorLayout,
    RPNHead,
    rpn_losses,
    select_proposals,
)
from cpm_tpu.ops.box_coder import BoxCoder


def _roi_scales(cfg):
    """Backbone/FPN spatial scales for the RoI levels [P2..P5]."""
    n = cfg.FPN.ROI_MAX_LEVEL - cfg.FPN.ROI_MIN_LEVEL + 1
    base = 0.5 ** cfg.FPN.ROI_MIN_LEVEL
    return tuple(base * (0.5**i) for i in range(n))


def _head_scales(cfg):
    """RoI-head pooling scales: FPN roi levels, or the single last
    backbone scale in non-FPN mode (model_builder.py:42-44:
    spatial_scale = Conv_Body.spatial_scale[-1:])."""
    if cfg.MODEL.FPN_ON:
        return _roi_scales(cfg)
    if cfg.BACKBONE.CONV_BODY.endswith("_c4"):
        return (1.0 / 16,)
    return (1.0 / 32 * cfg.BACKBONE.RESNET.C5_DILATION,)


def _head_features(cfg, features):
    """Slice the feature list the way the reference hands it to the RoI
    family: FPN roi levels, or [last backbone map] in non-FPN mode."""
    if cfg.MODEL.FPN_ON:
        return features[: len(_roi_scales(cfg))]
    return features[-1:]


class FastRCNNHead(nn.Module):
    """Fast R-CNN RoI family (fast_rcnn/fast_rcnn.py:12-75)."""

    cfg: Any

    def setup(self):
        c = self.cfg
        head_cls = registry.ROI_BOX_HEADS[c.FAST_RCNN.ROI_BOX_HEAD]
        scales = _head_scales(c)
        if c.FAST_RCNN.ROI_BOX_HEAD == "roi_2mlp_head":
            self.head = head_cls(
                resolution=tuple(c.FAST_RCNN.ROI_XFORM_RESOLUTION),
                scales=scales,
                sampling_ratio=c.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
                mlp_dim=c.FAST_RCNN.MLP_HEAD.MLP_DIM,
            )
        elif c.FAST_RCNN.ROI_BOX_HEAD in (
            "resnet_c5_head", "resnet_2mlp_head",
        ):
            r = c.BACKBONE.RESNET
            kw = dict(
                resolution=tuple(c.FAST_RCNN.ROI_XFORM_RESOLUTION),
                scales=scales,
                sampling_ratio=c.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
                layers4=r.LAYERS[3],
                width=r.WIDTH,
                stride_3x3=r.STRIDE_3X3,
                avg_down=r.AVG_DOWN,
                norm="gn" if r.USE_GN else "affine",
                conv=r.STAGE_WITH_CONV[3],
                context=r.STAGE_WITH_CONTEXT[3],
                ctx_ratio=r.CTX_RATIO,
                c5_dilation=r.C5_DILATION,
                base_planes=getattr(r, "BASE_PLANES", 64),
            )
            if c.FAST_RCNN.ROI_BOX_HEAD == "resnet_2mlp_head":
                kw["mlp_dim"] = c.FAST_RCNN.MLP_HEAD.MLP_DIM
            # USE_WS on the C5/2mlp stage-5 convs (ResNet.py:310,321)
            self.head = maybe_ws(head_cls, r.USE_WS)(**kw)
        else:
            # USE_WS on the stacked convs (fast_rcnn/heads/convfc_heads.py:51)
            self.head = maybe_ws(
                head_cls, c.FAST_RCNN.CONVFC_HEAD.USE_WS
            )(
                resolution=tuple(c.FAST_RCNN.ROI_XFORM_RESOLUTION),
                scales=scales,
                sampling_ratio=c.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
                conv_dim=c.FAST_RCNN.CONVFC_HEAD.CONV_DIM,
                num_stacked_convs=c.FAST_RCNN.CONVFC_HEAD.NUM_STACKED_CONVS,
                mlp_dim=c.FAST_RCNN.CONVFC_HEAD.MLP_DIM,
                dilation=c.FAST_RCNN.CONVFC_HEAD.DILATION,
            )
        self.output = BoxOutput(
            num_classes=c.MODEL.NUM_CLASSES,
            cls_agnostic_bbox_reg=c.MODEL.CLS_AGNOSTIC_BBOX_REG,
        )
        self.box_coder = BoxCoder(weights=tuple(c.FAST_RCNN.BBOX_REG_WEIGHTS))

    def __call__(
        self,
        features,
        proposals,
        prop_mask,
        image_sizes,
        gt=None,
        train: bool = False,
    ):
        c = self.cfg
        features = _head_features(c, features)
        if train:
            key = self.make_rng("sample")
            sampled = subsample_rois(
                jax.lax.stop_gradient(proposals),
                prop_mask,
                gt["boxes"],
                gt["labels"],
                gt["mask"],
                key,
                batch_size_per_image=c.FAST_RCNN.BATCH_SIZE_PER_IMAGE,
                positive_fraction=c.FAST_RCNN.POSITIVE_FRACTION,
                fg_iou_threshold=c.FAST_RCNN.FG_IOU_THRESHOLD,
                bg_iou_threshold=c.FAST_RCNN.BG_IOU_THRESHOLD,
                box_coder=self.box_coder,
            )
            rois = rois_with_batch_index(sampled.boxes)
            x = self.head(features, rois, sampled.mask.reshape(-1))
            cls_logits, box_reg = self.output(x)
            loss_cls, loss_box = fast_rcnn_losses(
                cls_logits,
                box_reg,
                sampled.labels.reshape(-1),
                sampled.reg_targets.reshape(-1, 4),
                sampled.mask.reshape(-1).astype(cls_logits.dtype),
                smooth_l1_beta=c.FAST_RCNN.SMOOTH_L1_BETA,
                cls_agnostic_bbox_reg=c.MODEL.CLS_AGNOSTIC_BBOX_REG,
            )
            return dict(loss_classifier=loss_cls, loss_box_reg=loss_box)

        B, K = proposals.shape[:2]
        rois = rois_with_batch_index(proposals)
        x = self.head(features, rois, prop_mask.reshape(-1))
        cls_logits, box_reg = self.output(x)
        num_classes = c.MODEL.NUM_CLASSES
        probs = jax.nn.softmax(cls_logits, axis=-1).reshape(B, K, num_classes)
        boxes_pc = decode_boxes_per_class(
            box_reg.reshape(B, K, -1),
            proposals,
            image_sizes,
            self.box_coder,
            num_classes,
            c.MODEL.CLS_AGNOSTIC_BBOX_REG,
        )
        return filter_detections(
            boxes_pc,
            probs,
            prop_mask,
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


class GeneralizedRCNN(nn.Module):
    """Backbone -> (FPN) -> RPN -> RoI head family."""

    cfg: Any

    def setup(self):
        c = self.cfg
        self.backbone = registry.BACKBONES[c.BACKBONE.CONV_BODY](c)
        if c.MODEL.FPN_ON:
            self.fpn = registry.FPN_BODY[c.FPN.BODY](c)
        num_cell_anchors = len(c.RPN.ASPECT_RATIOS) * (
            1 if len(c.RPN.ANCHOR_STRIDE) > 1 else len(c.RPN.ANCHOR_SIZES)
        )
        self.rpn_head = RPNHead(num_anchors=num_cell_anchors)
        self.rpn_box_coder = BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))

        if c.MODEL.FASTER_RCNN and not c.MODEL.CASCADE_ON:
            self.roi_head = FastRCNNHead(c)
        elif c.MODEL.FASTER_RCNN and c.MODEL.CASCADE_ON:
            from cpm_tpu.modeling.roi_heads.cascade_head import CascadeRCNNHead
            self.roi_head = CascadeRCNNHead(c)
        elif c.MODEL.GRID_ON and not c.GRID_RCNN.CASCADE_MAPPING_ON:
            from cpm_tpu.modeling.roi_heads.grid_cascade_head import (
                GridRCNNHead,
            )
            self.roi_head = GridRCNNHead(c)
        elif c.MODEL.GRID_ON and c.GRID_RCNN.CASCADE_MAPPING_ON:
            from cpm_tpu.modeling.roi_heads.grid_cascade_head import (
                GridCascadeRCNNHead,
            )
            self.roi_head = GridCascadeRCNNHead(c)
        elif not c.MODEL.RPN_ONLY:
            raise ValueError("no RoI head family selected by config")

    def _features(self, images):
        feats = self.backbone(images)
        if self.cfg.MODEL.FPN_ON:
            feats = self.fpn(feats)
        return feats

    def _anchor_layout(self, feats):
        c = self.cfg
        strides = tuple(c.RPN.ANCHOR_STRIDE)
        sizes = tuple(c.RPN.ANCHOR_SIZES)
        feat_shapes = [tuple(f.shape[1:3]) for f in feats]
        if len(strides) > 1:
            feat_shapes = feat_shapes[: len(strides)]
        else:
            feat_shapes = feat_shapes[:1]
        return AnchorLayout(
            feat_shapes, strides, sizes, tuple(c.RPN.ASPECT_RATIOS),
            straddle_thresh=c.RPN.STRADDLE_THRESH,
        )

    def _normalize_uint8(self, images: jnp.ndarray) -> jnp.ndarray:
        """Device-side input normalization for uint8 batches.

        The loader ships raw uint8 pixels (1/4 the host->device bytes of
        f32) with the channel order already matching TO_BGR255; this
        applies the per-channel (x*a + b) affine — the reference's
        in-model AffineChannel2d normalization (model_builder.py:24-28,
        164) done the XLA way: the affine fuses into conv1's input.

        Documented deviation: padded batch regions (uint8 zeros) map to
        -mean/std here, whereas host-side normalization (and the
        reference's *train* pipeline, which zero-pads after normalizing)
        leaves them exactly 0. This matches the reference's eval-time
        AffineChannel2d semantics (box_net pads raw pixels then
        normalizes in-model); at train it shifts conv features only in
        the padded border, which the valid-size-aware losses never read.
        Set TPU.DEVICE_NORMALIZE=False for exact host-path equivalence.
        """
        import numpy as np

        from cpm_tpu.utils.amp import compute_dtype

        c = self.cfg
        mean = np.asarray(c.PIXEL_MEANS, np.float32)
        std = np.asarray(c.PIXEL_STDS, np.float32)
        if c.TO_BGR255:
            a = 1.0 / std
        else:
            a = 1.0 / (255.0 * std)
        b = -mean / std
        out = images.astype(jnp.float32) * a + b
        return out.astype(compute_dtype(c))

    def __call__(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        gt: Optional[dict] = None,
        train: bool = False,
    ):
        """Train: returns dict of losses. Test: returns Detections.

        TPU.EVAL_POOLER_DTYPE='float32' pins eval-time RoI pooling to f32
        accumulation (the reference CUDA kernel's precision,
        ROIAlign_cuda.cu:14) while the rest of the net keeps the compute
        dtype — retires the bf16 pooler tie-flip deviation
        (docs/AB_DEVIATIONS.md) at a measured cost. Train pooling always
        uses the compute dtype (a deliberate throughput win).
        """
        from cpm_tpu.ops import pooler as _pooler_mod

        force_f32 = (not train) and str(
            getattr(self.cfg.TPU, "EVAL_POOLER_DTYPE", "compute")
        ) == "float32"
        if not force_f32:
            return self._forward(images, image_sizes, gt, train)
        with _pooler_mod.pooler_force_f32_scope(True):
            return self._forward(images, image_sizes, gt, train)

    def _forward(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        gt: Optional[dict] = None,
        train: bool = False,
    ):
        c = self.cfg
        if images.dtype == jnp.uint8:
            images = self._normalize_uint8(images)
        feats = self._features(images)
        rpn_feats = feats if c.MODEL.FPN_ON else feats[-1:]
        objectness, box_reg = self.rpn_head(rpn_feats)
        layout = self._anchor_layout(rpn_feats)

        kw = dict(
            pre_nms_top_n=(
                c.RPN.PRE_NMS_TOP_N_TRAIN if train else c.RPN.PRE_NMS_TOP_N_TEST
            ),
            post_nms_top_n=(
                c.RPN.POST_NMS_TOP_N_TRAIN if train else c.RPN.POST_NMS_TOP_N_TEST
            ),
            nms_thresh=c.RPN.NMS_THRESH,
            min_size=c.RPN.MIN_SIZE,
            fpn_post_nms_top_n=(
                c.RPN.FPN_POST_NMS_TOP_N_TRAIN
                if train
                else c.RPN.FPN_POST_NMS_TOP_N_TEST
            ),
            fpn_post_nms_per_batch=c.RPN.FPN_POST_NMS_PER_BATCH,
            is_train=train,
            box_coder=self.rpn_box_coder,
            # approx pre-NMS top-k is a train-speed knob only: eval always
            # uses exact lax.top_k so imported-weight validation matches
            # the reference's exact sort (inference.py:85-89)
            approx_topk=train and getattr(c.TPU, "APPROX_TOPK", True),
        )

        if train:
            assert gt is not None
            proposals, _, prop_mask = select_proposals(
                layout,
                [jax.lax.stop_gradient(o) for o in objectness],
                [jax.lax.stop_gradient(b) for b in box_reg],
                image_sizes,
                gt_boxes=gt["boxes"],
                gt_mask=gt["mask"],
                **kw,
            )
            loss_obj, loss_rpn_box = rpn_losses(
                layout,
                objectness,
                box_reg,
                image_sizes,
                gt["boxes"],
                gt["mask"],
                self.make_rng("sample"),
                fg_iou_threshold=c.RPN.FG_IOU_THRESHOLD,
                bg_iou_threshold=c.RPN.BG_IOU_THRESHOLD,
                batch_size_per_image=c.RPN.BATCH_SIZE_PER_IMAGE,
                positive_fraction=c.RPN.POSITIVE_FRACTION,
                smooth_l1_beta=c.RPN.SMOOTH_L1_BETA,
                box_coder=self.rpn_box_coder,
            )
            losses = dict(
                loss_objectness=loss_obj, loss_rpn_box_reg=loss_rpn_box
            )
            if c.MODEL.RPN_ONLY:
                return losses
            # heads slice to their RoI levels internally; the full level
            # list is needed by ENHANCE_FEATURES (P6 mixes into P5)
            head_losses = self.roi_head(
                feats,
                proposals,
                prop_mask,
                image_sizes,
                gt=gt,
                train=True,
            )
            losses.update(head_losses)
            return losses

        proposals, scores, prop_mask = select_proposals(
            layout, objectness, box_reg, image_sizes, **kw
        )
        if c.MODEL.RPN_ONLY:
            return Detections(
                boxes=proposals,
                scores=scores,
                labels=jnp.zeros(scores.shape, jnp.int32),
                mask=prop_mask,
            )
        return self.roi_head(
            feats,
            proposals,
            prop_mask,
            image_sizes,
            train=False,
        )


def build_model(cfg) -> GeneralizedRCNN:
    from cpm_tpu.config import freeze_to_ns
    from cpm_tpu.modeling import initializers as init_scheme
    from cpm_tpu.ops.pooler import set_pooler_backend

    set_pooler_backend(getattr(cfg.TPU, "POOLER_KERNEL", "auto"))
    # module-level state read by initializers at trace time: call
    # build_model before (re-)init'ing params, as all entry points do
    init_scheme.set_scheme(
        getattr(cfg.MODEL, "INIT_SCHEME", "reference")
    )
    if isinstance(cfg, dict):
        cfg = freeze_to_ns(cfg)
    return GeneralizedRCNN(cfg)
