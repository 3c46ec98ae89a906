"""TTA post-merge filtering (reference core/test.py:44-48 + filter_results
:433-509): per-pass detections concatenated then filtered ONCE, so
duplicate boxes from flip/scale passes cannot survive."""

import numpy as np

from cpm_tpu.config import get_default_cfg
from cpm_tpu.engine.test import merge_tta_detections
from cpm_tpu.structures.boxes import box_iou


def _pass(boxes, scores, labels):
    n = len(boxes)
    return dict(
        boxes=np.asarray(boxes, np.float32),
        scores=np.asarray(scores, np.float32),
        labels=np.asarray(labels, np.int32),
        mask=np.ones(n, bool),
    )


def _duplicate_free(out, thresh):
    kept = out["boxes"][out["mask"]]
    lab = out["labels"][out["mask"]]
    if len(kept) < 2:
        return True
    iou = np.asarray(box_iou(kept, kept))
    same = lab[:, None] == lab[None, :]
    off = ~np.eye(len(kept), dtype=bool)
    return not np.any((iou > thresh) & same & off)


def test_tta_merge_removes_cross_pass_duplicates():
    cfg = get_default_cfg()
    cfg.FAST_RCNN.SCORE_THRESH = 0.05
    cfg.FAST_RCNN.NMS = 0.5
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 8
    # pass 2 re-detects pass 1's objects at slightly shifted coords
    p1 = _pass(
        [[10, 10, 50, 50], [100, 100, 160, 160]], [0.9, 0.8], [1, 2]
    )
    p2 = _pass(
        [[11, 11, 51, 51], [101, 99, 161, 159], [200, 200, 240, 240]],
        [0.85, 0.82, 0.7],
        [1, 2, 1],
    )
    out = merge_tta_detections(cfg, [p1, p2])
    assert out["boxes"].shape == (8, 4)
    # 3 distinct objects survive, duplicates suppressed
    assert int(out["mask"].sum()) == 3
    assert _duplicate_free(out, cfg.FAST_RCNN.NMS)
    # the higher-scored copy of each duplicate pair wins
    kept_scores = sorted(out["scores"][out["mask"]].tolist(), reverse=True)
    assert np.allclose(kept_scores, [0.9, 0.82, 0.7], atol=1e-6)


def test_tta_merge_different_labels_do_not_suppress():
    cfg = get_default_cfg()
    cfg.FAST_RCNN.SCORE_THRESH = 0.05
    cfg.FAST_RCNN.NMS = 0.5
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 8
    p1 = _pass([[10, 10, 50, 50]], [0.9], [1])
    p2 = _pass([[10, 10, 50, 50]], [0.8], [2])  # same box, other class
    out = merge_tta_detections(cfg, [p1, p2])
    assert int(out["mask"].sum()) == 2


def test_tta_merge_soft_nms_path():
    cfg = get_default_cfg()
    cfg.FAST_RCNN.SCORE_THRESH = 0.05
    cfg.FAST_RCNN.NMS = 0.5
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 8
    cfg.TEST.SOFT_NMS.ENABLED = True
    p1 = _pass([[10, 10, 50, 50]], [0.9], [1])
    p2 = _pass([[11, 11, 51, 51]], [0.85], [1])
    out = merge_tta_detections(cfg, [p1, p2])
    kept = out["scores"][out["mask"]]
    # soft-NMS decays, not removes: both survive but the duplicate's
    # score is pushed down
    assert len(kept) == 2
    assert kept.max() > 0.89 and kept.min() < 0.5


def test_tta_merge_box_voting_path():
    cfg = get_default_cfg()
    cfg.FAST_RCNN.SCORE_THRESH = 0.05
    cfg.FAST_RCNN.NMS = 0.5
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 8
    cfg.TEST.BBOX_VOTE.ENABLED = True
    cfg.TEST.BBOX_VOTE.VOTE_TH = 0.5
    p1 = _pass([[10, 10, 50, 50]], [0.6], [1])
    p2 = _pass([[14, 14, 54, 54]], [0.6], [1])  # IoU ~0.69 -> suppressed
    out = merge_tta_detections(cfg, [p1, p2])
    kept = out["boxes"][out["mask"]]
    assert len(kept) == 1
    # voted box is the score-weighted average of both overlapping boxes
    np.testing.assert_allclose(kept[0], [12, 12, 52, 52], atol=1e-3)
