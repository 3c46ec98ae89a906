"""Flagship-WIDTH whole-model eval parity vs the reference torch CPM.

VERDICT r2 item 3: the tiny-config parity test (test_model_parity.py)
left a gap between its 50-100-proposal setup and the flagship operating
point. This test closes it: R-50 trunk (3,4,6,3), 81 classes, 1000 test
proposals per level/image, ISM + RSM + CMM all on, full-width grid tower
(8 convs x 576 ch), float32 compute (eval top-k is always exact —
approx_topk applies to the train path only, modeling/model.py:324), with
reference-init weights imported through import_cpm_checkpoint, over 8
realistic synthetic images.

Reference path under test: pet/rcnn/modeling/grid_cascade_rcnn/
inference.py:15-320 composed through model_builder.py:71-159.

Two deltas from the flagship YAML, both applied to BOTH sides and
neither touching any weight shape: GRID_RCNN.SCORE_THRESH is raised so
random-init cls survivors stay within a fixed detection buffer (the
real 0.03 threshold is only meaningful with trained weights), and
images are 512x768 rather than 800x1333 to bound CPU runtime.

Slow (~10+ min on CPU): run with -m '' or explicitly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.ref_oracle import install_reference_stubs
from tests.test_model_parity import _set_path

pytestmark = pytest.mark.slow

IMG_H, IMG_W = 512, 768
N_IMAGES = 8

FULLSIZE_DELTAS = [
    ("MODEL.FPN_ON", True),
    ("MODEL.FASTER_RCNN", False),
    ("MODEL.GRID_ON", True),
    ("MODEL.NUM_CLASSES", 81),
    ("MODEL.CONV1_RGB2BGR", False),
    ("BACKBONE.RESNET.LAYERS", (3, 4, 6, 3)),  # R-50, flagship trunk
    ("RPN.ANCHOR_STRIDE", (4, 8, 16, 32, 64)),
    ("RPN.PRE_NMS_TOP_N_TEST", 1000),
    ("RPN.POST_NMS_TOP_N_TEST", 1000),
    ("RPN.FPN_POST_NMS_TOP_N_TEST", 1000),
    ("GRID_RCNN.CASCADE_MAPPING_ON", True),  # CMM
    ("GRID_RCNN.IOU_HELPER", True),          # ISM
    ("GRID_RCNN.IOU_HELPER_MERGE", True),
    ("GRID_RCNN.RESCORE_ON", True),          # RSM
    ("GRID_RCNN.FUSED_ON", False),           # flagship yamls: FUSED_ON False
    ("GRID_RCNN.SCORE_THRESH", 0.45),         # see module docstring
    ("GRID_RCNN.TEST_MAX_DETECTIONS", 512),
    ("GRID_RCNN.CASCADE_MAPPING_OPTION.TEST_ENSEMBLE", False),
]


def _images():
    """Realistic-ish synthetic images: textured background + rectangles
    of distinct intensity (objects at several scales), zero-mean float."""
    rng = np.random.RandomState(11)
    imgs = []
    for _ in range(N_IMAGES):
        img = rng.randn(3, IMG_H, IMG_W).astype(np.float32) * 0.3
        for _ in range(rng.randint(4, 9)):
            w = int(rng.uniform(30, 300))
            h = int(rng.uniform(30, 300))
            x = rng.randint(0, IMG_W - w)
            y = rng.randint(0, IMG_H - h)
            img[:, y : y + h, x : x + w] += rng.uniform(
                -2.0, 2.0, (3, 1, 1)
            ).astype(np.float32)
        imgs.append(img)
    return imgs


@pytest.fixture(scope="module")
def reference_full():
    install_reference_stubs()
    import copy as _copy
    import importlib

    ref_config = importlib.import_module("pet.rcnn.core.config")
    snapshot = _copy.deepcopy(dict(ref_config.cfg))
    for path, value in FULLSIZE_DELTAS:
        _set_path(ref_config.cfg, path, value)

    MB = importlib.import_module("pet.rcnn.modeling.model_builder")
    torch.manual_seed(0)
    model = MB.Generalized_RCNN(is_train=True)
    with torch.no_grad():
        for name, p in model.named_parameters():
            # sharpen every score/heatmap-producing layer: at init
            # std=0.01 survivor sets and argmax positions are decided by
            # sub-1e-6 ties that f32 drift flips; well-separated logits
            # make the comparison measure composition, not ties
            if name.endswith((
                "cls_score.weight", "cls_logits.weight",
            )):
                p.mul_(60.0)
            if name.endswith("deconv_2.weight"):
                p.mul_(30.0)
            # ISM raw iou logit must be positive: the RSM fusion is
            # score^0.8 * rescore^0.2 and score = cls * iou_logits[:,1]
            # (inference.py:174-182) — a negative random-init iou logit
            # sends BOTH frameworks to nan^0.8 (identical but
            # incomparable). Trained models predict positive IoUs; bias
            # the branch there. No sharpening needed: iou scores never
            # decide survivor sets, only score values.
            if name.endswith("iou_pred.bias"):
                p.add_(2.0)
    rng = np.random.RandomState(0)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rng.uniform(-0.5, 0.5, n).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, n).astype(np.float32)))

    yield model

    for k in list(ref_config.cfg.keys()):
        ref_config.cfg[k] = snapshot[k]


@pytest.fixture(scope="module")
def our_full(reference_full):
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling.model import build_model
    from cpm_tpu.utils.weight_import import import_cpm_checkpoint

    cfg = get_default_cfg()
    for path, value in FULLSIZE_DELTAS:
        _set_path(cfg, path, value)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    sd = {
        k: v.detach().numpy() for k, v in reference_full.state_dict().items()
    }
    params = import_cpm_checkpoint(sd, cfg)
    model = build_model(cfg)
    return cfg, model, params


def _set_match(a, b, la=None, lb=None, tol=0.5):
    if len(a) == 0 or len(b) == 0:
        return 0
    d = np.abs(a[:, None, :] - b[None, :, :]).max(-1)
    if la is not None:
        d = d + 1e6 * (la[:, None] != lb[None, :])
    return d, (d.min(1) < tol).sum()


def test_fullsize_eval_detection_parity(reference_full, our_full):
    cfg, model, params = our_full
    reference_full.eval()

    fwd = jax.jit(
        lambda p, im, sz: model.apply({"params": p}, im, sz, train=False)
    )

    tot_ref = tot_tight = 0
    score_err = []
    for idx, img in enumerate(_images()):
        with torch.no_grad():
            results = reference_full(torch.from_numpy(img[None]))
        ref = results[0]
        ref_boxes = ref.bbox.numpy()
        ref_scores = ref.get_field("scores").numpy()
        ref_labels = ref.get_field("labels").numpy()
        assert len(ref_boxes) < cfg.GRID_RCNN.TEST_MAX_DETECTIONS, (
            "detection buffer too small for this image; raise "
            "TEST_MAX_DETECTIONS", len(ref_boxes),
        )

        dets = fwd(
            params,
            jnp.asarray(img.transpose(1, 2, 0)[None]),
            jnp.asarray([[IMG_H, IMG_W]]),
        )
        m = np.asarray(dets.mask[0])
        got_boxes = np.asarray(dets.boxes[0])[m]
        got_scores = np.asarray(dets.scores[0])[m]
        got_labels = np.asarray(dets.labels[0])[m]

        # detection count must agree exactly per image
        assert len(got_boxes) == len(ref_boxes), (
            f"image {idx}: count {len(got_boxes)} vs ref {len(ref_boxes)}"
        )
        if len(ref_boxes) == 0:
            continue
        d, n_tight = _set_match(
            ref_boxes, got_boxes, ref_labels, got_labels, tol=0.5
        )
        tot_ref += len(ref_boxes)
        tot_tight += n_tight
        mi, j = d.min(1), d.argmin(1)
        tight = mi < 0.5
        if tight.any():
            score_err.append(
                np.abs(ref_scores[tight] - got_scores[j[tight]]).max()
            )

    assert tot_ref > 0, "reference produced no detections at all"
    # strong majority of detections agree to sub-pixel across the
    # full-width cascade (random-weight heatmap argmax flips a small
    # minority under f32 drift; decode arithmetic is bit-pinned by
    # test_grid_ops.py oracles)
    assert tot_tight >= 0.7 * tot_ref, (tot_tight, tot_ref)
    # matched detections agree on the ISM/RSM-fused score
    assert max(score_err) < 0.02, score_err
