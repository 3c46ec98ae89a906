"""COCOEvaluator protocol tests with hand-checkable cases."""

import numpy as np

from cpm_tpu.data.coco_io import CocoIndex
from cpm_tpu.evaluation.coco_eval import COCOEvaluator, bbox_iou_xywh


def _gt_dataset():
    return CocoIndex(
        dict(
            images=[
                dict(id=1, width=100, height=100),
                dict(id=2, width=100, height=100),
            ],
            categories=[dict(id=7, name="a"), dict(id=9, name="b")],
            annotations=[
                dict(id=1, image_id=1, category_id=7, bbox=[10, 10, 20, 20],
                     area=400, iscrowd=0),
                dict(id=2, image_id=1, category_id=9, bbox=[50, 50, 40, 40],
                     area=1600, iscrowd=0),
                dict(id=3, image_id=2, category_id=7, bbox=[0, 0, 50, 50],
                     area=2500, iscrowd=0),
            ],
        )
    )


def test_perfect_detections_ap1():
    gt = _gt_dataset()
    results = [
        dict(image_id=1, category_id=7, bbox=[10, 10, 20, 20], score=0.9),
        dict(image_id=1, category_id=9, bbox=[50, 50, 40, 40], score=0.8),
        dict(image_id=2, category_id=7, bbox=[0, 0, 50, 50], score=0.95),
    ]
    stats = COCOEvaluator(gt).evaluate(results)
    assert np.isclose(stats["AP"], 1.0)
    assert np.isclose(stats["AP50"], 1.0)
    assert np.isclose(stats["AP90"], 1.0)
    assert np.isclose(stats["AR100"], 1.0)


def test_no_detections_ap0():
    gt = _gt_dataset()
    stats = COCOEvaluator(gt).evaluate([])
    assert np.isclose(stats["AP"], 0.0)


def test_half_iou_matches_only_low_thresholds():
    gt = _gt_dataset()
    # box shifted so IoU ~ 0.6: gt [10,10,20,20]; dt [10,16,20,20]
    # inter = 20*14=280, union = 400+400-280=520, IoU=0.538
    results = [
        dict(image_id=1, category_id=7, bbox=[10, 16, 20, 20], score=0.9),
    ]
    stats = COCOEvaluator(gt, use_cats=[7]).evaluate(results, img_ids=[1])
    assert stats["AP50"] > 0.9  # matches at 0.5
    assert np.isclose(stats["AP75"], 0.0)  # not at 0.75
    assert stats["AP"] < 0.2


def test_duplicate_detection_is_fp():
    gt = _gt_dataset()
    results = [
        dict(image_id=1, category_id=7, bbox=[10, 10, 20, 20], score=0.9),
        dict(image_id=1, category_id=7, bbox=[11, 11, 20, 20], score=0.8),
    ]
    stats = COCOEvaluator(gt, use_cats=[7]).evaluate(results, img_ids=[1])
    # precision at recall 1.0 drops due to the duplicate, AP stays 1.0
    # because the TP ranks first (101-pt interpolation keeps max precision)
    assert np.isclose(stats["AP50"], 1.0)


def test_score_ordering_matters():
    gt = _gt_dataset()
    # FP scored above the TP pulls the precision envelope down
    results = [
        dict(image_id=1, category_id=7, bbox=[70, 70, 10, 10], score=0.95),
        dict(image_id=1, category_id=7, bbox=[10, 10, 20, 20], score=0.5),
    ]
    stats = COCOEvaluator(gt, use_cats=[7]).evaluate(results, img_ids=[1])
    assert 0.0 < stats["AP50"] < 1.0


def test_crowd_gt_is_ignored():
    gt = CocoIndex(
        dict(
            images=[dict(id=1, width=100, height=100)],
            categories=[dict(id=7, name="a")],
            annotations=[
                dict(id=1, image_id=1, category_id=7, bbox=[10, 10, 20, 20],
                     area=400, iscrowd=0),
                dict(id=2, image_id=1, category_id=7, bbox=[40, 40, 30, 30],
                     area=900, iscrowd=1),
            ],
        )
    )
    # detection on the crowd region: matched to crowd -> ignored (not FP)
    results = [
        dict(image_id=1, category_id=7, bbox=[10, 10, 20, 20], score=0.9),
        dict(image_id=1, category_id=7, bbox=[40, 40, 30, 30], score=0.8),
    ]
    stats = COCOEvaluator(gt).evaluate(results)
    assert np.isclose(stats["AP50"], 1.0)


def test_area_split():
    gt = _gt_dataset()
    results = [
        dict(image_id=1, category_id=7, bbox=[10, 10, 20, 20], score=0.9),
    ]
    stats = COCOEvaluator(gt, use_cats=[7]).evaluate(results, img_ids=[1])
    # 20x20 box is small-area; APs defined, APl has no gt -> -1
    assert stats["APs"] >= 0
    assert stats["APl"] == -1.0


def test_iou_crowd_denominator():
    dt = np.array([[0, 0, 10, 10]], np.float64)
    gtb = np.array([[0, 0, 20, 20]], np.float64)
    iou_normal = bbox_iou_xywh(dt, gtb, np.array([0]))
    iou_crowd = bbox_iou_xywh(dt, gtb, np.array([1]))
    assert np.isclose(iou_normal[0, 0], 100 / 400)
    assert np.isclose(iou_crowd[0, 0], 1.0)  # inter / det area


def test_check_expected_results_guard():
    """Regression guard semantics (reference evaluation.py:386-405)."""
    from cpm_tpu.evaluation.coco_eval import check_expected_results

    stats = {"AP": 0.417, "AP50": 0.592}
    logs = []
    # Inside the band -> PASS, no failures.
    fails = check_expected_results(
        stats, (("AP", 0.416, 0.003),), 4, log=logs.append
    )
    assert fails == []
    assert logs and logs[0].startswith("PASS: bbox > AP")
    # Outside mean + sigma_tol*std -> FAIL recorded and logged.
    fails = check_expected_results(
        stats, (("AP50", 0.50, 0.002), ("AP", 0.417, 0.01)), 4, log=logs.append
    )
    assert len(fails) == 1 and "AP50" in fails[0]
    # Unknown metric is a failure, not a crash.
    fails = check_expected_results(stats, (("APx", 0.1, 0.1),), 4, log=logs.append)
    assert len(fails) == 1 and "APx" in fails[0]
    # Empty tuple (the reference's shipped state) is a no-op.
    assert check_expected_results(stats, (), 4, log=logs.append) == []


def test_expected_results_cfg_keys_exist():
    from cpm_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    assert cfg.TEST.EXPECTED_RESULTS == ()
    assert cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL == 4
