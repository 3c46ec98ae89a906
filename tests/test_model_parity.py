"""Whole-model forward parity vs the reference torch Generalized_RCNN.

The reference model (/root/reference/pet/rcnn/modeling/model_builder.py:19)
runs end-to-end on CPU with the real numerical stubs from ref_oracle
(torchvision nms, _C.ml_nms, _C.roi_align_forward — each pinned by its own
oracle test). A tiny full-width CPM (Grid-Cascade + CMM/ISM/RSM) config is
built on BOTH sides, the torch weights are imported through
import_cpm_checkpoint, and:

  * eval: the same image must produce the same detections (boxes, scores,
    labels) through RPN -> cls branch -> 3 grid stages -> grid decode ->
    ISM score replacement -> RSM re-scoring;
  * train: the same (image, targets) batch must produce the same loss dict
    (sampling made deterministic by over-sized sampler budgets: every
    candidate is selected on both sides).

This is the composition-level complement of the module-level golden tests
in test_weight_parity.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.ref_oracle import install_reference_stubs

# (path, value) deltas applied to BOTH config systems. Full-width R-18ish
# trunk (the reference trunk cannot shrink channel widths), tiny grid
# tower, oversized sampler budgets for deterministic sampling.
PARITY_DELTAS = [
    ("MODEL.FPN_ON", True),
    ("MODEL.FASTER_RCNN", False),
    ("MODEL.GRID_ON", True),
    ("MODEL.NUM_CLASSES", 9),
    ("BACKBONE.CONV_BODY", "resnet"),
    # both models consume the same raw float image — no caffe BGR swap
    # on the imported conv1
    ("MODEL.CONV1_RGB2BGR", False),
    ("BACKBONE.RESNET.LAYERS", (1, 1, 1, 1)),
    ("RPN.ANCHOR_STRIDE", (4, 8, 16, 32, 64)),
    ("RPN.PRE_NMS_TOP_N_TRAIN", 200),
    ("RPN.POST_NMS_TOP_N_TRAIN", 100),
    ("RPN.FPN_POST_NMS_TOP_N_TRAIN", 100),
    ("RPN.PRE_NMS_TOP_N_TEST", 100),
    ("RPN.POST_NMS_TOP_N_TEST", 50),
    ("RPN.FPN_POST_NMS_TOP_N_TEST", 50),
    ("RPN.BATCH_SIZE_PER_IMAGE", 8192),  # >= all valid anchors
    ("GRID_RCNN.CASCADE_MAPPING_ON", True),
    ("GRID_RCNN.IOU_HELPER", True),
    ("GRID_RCNN.IOU_HELPER_MERGE", True),
    ("GRID_RCNN.RESCORE_ON", True),
    ("GRID_RCNN.BATCH_SIZE_PER_IMAGE", 256),  # >= proposals + gt
    ("GRID_RCNN.MAX_SAMPLE_NUM_GRID", 96),
    ("GRID_RCNN.MLP_HEAD.MLP_DIM", 64),
    ("GRID_RCNN.GRID_HEAD.NUM_CONVS", 2),
    ("GRID_RCNN.GRID_HEAD.POINT_FEAT_CHANNELS", 8),
    # our fixed-shape detection buffer; the reference has NO cap after
    # its cls NMS (CLSPostProcessor.filter_results) — 400 covers every
    # possible survivor (50 proposals x 8 fg classes)
    ("GRID_RCNN.TEST_MAX_DETECTIONS", 400),
    # all real CPM yamls disable the (unimplemented) stage-logit ensemble
    ("GRID_RCNN.CASCADE_MAPPING_OPTION.TEST_ENSEMBLE", False),
]


def _set_path(cfg, path, value):
    parts = path.split(".")
    d = cfg
    for p in parts[:-1]:
        d = d[p] if isinstance(d, dict) else getattr(d, p)
    if isinstance(d, dict):
        d[parts[-1]] = value
    else:
        setattr(d, parts[-1], value)


def _image_and_targets():
    rng = np.random.RandomState(7)
    img = rng.randn(3, 128, 160).astype(np.float32)
    boxes = np.array(
        [
            [10.0, 12.0, 90.0, 100.0],
            [40.0, 20.0, 150.0, 110.0],
            [80.0, 60.0, 120.0, 120.0],
        ],
        np.float32,
    )
    labels = np.array([1, 4, 7], np.int64)
    return img, boxes, labels


@pytest.fixture(scope="module")
def reference_cpm():
    """Reference Generalized_RCNN under the tiny parity config, with its
    global cfg snapshotted/restored around the module."""
    install_reference_stubs()
    import copy as _copy
    import importlib

    ref_config = importlib.import_module("pet.rcnn.core.config")
    snapshot = _copy.deepcopy(dict(ref_config.cfg))
    for path, value in PARITY_DELTAS:
        _set_path(ref_config.cfg, path, value)

    MB = importlib.import_module("pet.rcnn.modeling.model_builder")
    torch.manual_seed(0)
    model = MB.Generalized_RCNN(is_train=True)
    # sharpen score-producing layers: at init std=0.01 every class scores
    # ~1/9 and NMS survivor sets are decided by sub-1e-6 ties that f32
    # drift flips; with well-separated scores the comparison measures
    # composition, not tie-breaking luck
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith((
                "cls_score.weight", "iou_pred.weight", "cls_logits.weight",
            )):
                p.mul_(60.0)
    # non-trivial BN running stats so BN-folding import is exercised
    rng = np.random.RandomState(0)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rng.uniform(-0.5, 0.5, n).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, n).astype(np.float32)))

    yield model

    # restore the reference global cfg for other oracle tests
    for k in list(ref_config.cfg.keys()):
        ref_config.cfg[k] = snapshot[k]


@pytest.fixture(scope="module")
def our_model(reference_cpm):
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling.model import build_model
    from cpm_tpu.utils.weight_import import import_cpm_checkpoint

    cfg = get_default_cfg()
    for path, value in PARITY_DELTAS:
        _set_path(cfg, path, value)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    sd = {k: v.detach().numpy() for k, v in reference_cpm.state_dict().items()}
    params = import_cpm_checkpoint(sd, cfg)
    model = build_model(cfg)
    return cfg, model, params


def _ref_boxlist(boxes, labels, size_wh):
    import importlib

    BB = importlib.import_module(
        "pet.utils.data.structures.bounding_box"
    )
    t = BB.BoxList(torch.from_numpy(boxes), size_wh, mode="xyxy")
    t.add_field("labels", torch.from_numpy(labels))
    return t


def test_eval_detection_parity(reference_cpm, our_model):
    """Eval composition parity, asserted at three levels:

    1. RPN proposals and cls-branch survivors must match EXACTLY as sets
       (<=0.05 px) — these paths are deterministic given the weights.
    2. Final grid-refined detections: the per-point heatmap argmax on a
       RANDOM-weight model rides near-uniform maps, so f32 drift flips a
       minority of argmaxes (cascade-amplified); the decode arithmetic
       itself is bit-pinned by tests/test_grid_ops.py oracles. Require
       equal counts and a strong majority of exactly-matching boxes.
    """
    cfg, model, params = our_model
    img, _, _ = _image_and_targets()

    cap_ref = {}
    G = reference_cpm.Grid_Cascade_RCNN
    orig_cls = G._forward_test_cls

    def cls_hook(features, proposals):
        cap_ref["rpn"] = proposals[0].bbox.detach().numpy().copy()
        f, result, _ = orig_cls(features, proposals)
        cap_ref["cls_boxes"] = result[0].bbox.detach().numpy().copy()
        cap_ref["cls_labels"] = (
            result[0].get_field("labels").detach().numpy().copy()
        )
        return f, result, {}

    reference_cpm.eval()
    G._forward_test_cls = cls_hook
    try:
        with torch.no_grad():
            results = reference_cpm(torch.from_numpy(img[None]))
    finally:
        G._forward_test_cls = orig_cls
    ref = results[0]
    ref_boxes = ref.bbox.numpy()
    ref_scores = ref.get_field("scores").numpy()
    ref_labels = ref.get_field("labels").numpy()

    import cpm_tpu.modeling.roi_heads.grid_cascade_head as GCH

    cap_our = {}
    orig_tc = GCH.GridCascadeRCNNHead._test_cls

    def tc_hook(self, features, proposals, prop_mask, image_sizes):
        cap_our["rpn"] = np.asarray(proposals[0])
        cap_our["rpn_mask"] = np.asarray(prop_mask[0])
        dets = orig_tc(self, features, proposals, prop_mask, image_sizes)
        cap_our["cls"] = jax.tree_util.tree_map(np.asarray, dets)
        return dets

    GCH.GridCascadeRCNNHead._test_cls = tc_hook
    try:
        dets = model.apply(
            {"params": params},
            jnp.asarray(img.transpose(1, 2, 0)[None]),
            jnp.asarray([[128, 160]]),
            train=False,
        )
    finally:
        GCH.GridCascadeRCNNHead._test_cls = orig_tc

    def set_match(a, b, la=None, lb=None, tol=0.05):
        d = np.abs(a[:, None, :] - b[None, :, :]).max(-1)
        if la is not None:
            d = d + 1e6 * (la[:, None] != lb[None, :])
        return (d.min(1) < tol).sum()

    # 1. RPN proposals: exact set
    our_rpn = cap_our["rpn"][cap_our["rpn_mask"].astype(bool)]
    assert len(our_rpn) == len(cap_ref["rpn"])
    assert set_match(cap_ref["rpn"], our_rpn) == len(cap_ref["rpn"])

    # 1b. cls-branch survivors: exact set (boxes + labels)
    cm = cap_our["cls"].mask[0].astype(bool)
    our_cls_boxes = cap_our["cls"].boxes[0][cm]
    our_cls_labels = cap_our["cls"].labels[0][cm]
    assert len(our_cls_boxes) == len(cap_ref["cls_boxes"]), (
        len(our_cls_boxes), len(cap_ref["cls_boxes"]),
    )
    assert set_match(
        cap_ref["cls_boxes"], our_cls_boxes,
        cap_ref["cls_labels"], our_cls_labels,
    ) == len(cap_ref["cls_boxes"])

    # 2. final detections
    m = np.asarray(dets.mask[0])
    got_boxes = np.asarray(dets.boxes[0])[m]
    got_scores = np.asarray(dets.scores[0])[m]
    got_labels = np.asarray(dets.labels[0])[m]
    assert len(got_boxes) == len(ref_boxes), (
        len(got_boxes), len(ref_boxes),
    )
    n_tight = set_match(ref_boxes, got_boxes, ref_labels, got_labels,
                        tol=0.5)
    assert n_tight >= 0.7 * len(ref_boxes), (n_tight, len(ref_boxes))
    # matched detections must also agree on the (ISM/RSM-fused) score
    d = np.abs(ref_boxes[:, None, :] - got_boxes[None, :, :]).max(-1)
    d = d + 1e6 * (ref_labels[:, None] != got_labels[None, :])
    mi, j = d.min(1), d.argmin(1)
    tightm = mi < 0.5
    assert np.abs(ref_scores[tightm] - got_scores[j[tightm]]).max() < 0.02


def test_train_loss_parity(reference_cpm, our_model):
    cfg, model, params = our_model
    img, boxes, labels = _image_and_targets()

    reference_cpm.train()
    target = _ref_boxlist(boxes, labels, (160, 128))
    with torch.no_grad():
        out = reference_cpm(
            torch.from_numpy(img[None]), targets=[target]
        )
    ref_losses = {k: float(v) for k, v in out["losses"].items()}

    gt = dict(
        boxes=jnp.asarray(boxes[None]),
        labels=jnp.asarray(labels[None].astype(np.int32)),
        mask=jnp.ones((1, len(boxes)), bool),
    )
    losses = model.apply(
        {"params": params},
        jnp.asarray(img.transpose(1, 2, 0)[None]),
        jnp.asarray([[128, 160]]),
        gt=gt,
        train=True,
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    got_losses = {k: float(v) for k, v in losses.items()}

    assert set(got_losses) == set(ref_losses), (
        sorted(got_losses), sorted(ref_losses),
    )
    for k in sorted(ref_losses):
        np.testing.assert_allclose(
            got_losses[k], ref_losses[k], rtol=5e-3, atol=1e-5,
            err_msg=f"loss {k}: ours={got_losses[k]} ref={ref_losses[k]}",
        )
