"""Fuzz-oracle test: the from-scratch COCOEvaluator vs the reference's own
vendored COCOeval (/root/reference/pet/rcnn/datasets/mycocoeval.py).

The reference evaluator needs only `pycocotools.mask.iou` (bbox branch),
which is stubbed here with this repo's bbox_iou_xywh (itself pinned by
tests/test_coco_eval.py property tests), and a COCO-like index object.
100+ randomized det/gt sets — crowds, ties, empty categories, images with
no gt, out-of-range areas — must produce all 16 summary stats equal.
"""

import sys
import types

import numpy as np
import pytest

from cpm_tpu.evaluation.coco_eval import COCOEvaluator, bbox_iou_xywh


class _FakeCOCO:
    """The minimal index surface mycocoeval touches: getImgIds,
    getCatIds, getAnnIds(imgIds, catIds), loadAnns."""

    def __init__(self, anns, img_ids, cat_ids):
        self.anns = {a["id"]: a for a in anns}
        self._img_ids = list(img_ids)
        self._cat_ids = list(cat_ids)

    def getImgIds(self):
        return list(self._img_ids)

    def getCatIds(self):
        return list(self._cat_ids)

    def getAnnIds(self, imgIds=None, catIds=None):
        im = set(imgIds) if imgIds is not None else None
        ct = set(catIds) if catIds is not None else None
        return [
            a["id"]
            for a in self.anns.values()
            if (im is None or a["image_id"] in im)
            and (ct is None or a["category_id"] in ct)
        ]

    def loadAnns(self, ids):
        return [self.anns[i] for i in ids]


class _MinimalIndex:
    """CocoIndex-like view for COCOEvaluator."""

    def __init__(self, anns, img_ids, cat_ids):
        self._by_img = {}
        for a in anns:
            self._by_img.setdefault(a["image_id"], []).append(a)
        self._img_ids = list(img_ids)
        self._cat_ids = list(cat_ids)

    def getImgIds(self):
        return list(self._img_ids)

    def getCatIds(self):
        return list(self._cat_ids)

    def annotations_for_image(self, img_id):
        return list(self._by_img.get(img_id, []))


@pytest.fixture(scope="module")
def ref_cocoeval():
    if "pycocotools" not in sys.modules:
        pc = types.ModuleType("pycocotools")
        mk = types.ModuleType("pycocotools.mask")

        def iou(d, g, iscrowd):
            d = np.asarray(d, np.float64).reshape(-1, 4)
            g = np.asarray(g, np.float64).reshape(-1, 4)
            if len(d) == 0 or len(g) == 0:
                return []
            return bbox_iou_xywh(d, g, np.asarray(iscrowd))

        mk.iou = iou
        pc.mask = mk
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.mask"] = mk
    # load by file path: the pet.rcnn.datasets package __init__ pulls in
    # torch data-loading deps this environment doesn't have, but
    # mycocoeval.py itself only needs numpy + pycocotools.mask
    import importlib.util

    path = "/root/reference/pet/rcnn/datasets/mycocoeval.py"
    import os

    if not os.path.exists(path):
        pytest.skip("reference tree unavailable")
    spec = importlib.util.spec_from_file_location("ref_mycocoeval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # modern numpy rejects the float `num` the 2019-era code passes to
    # linspace (mycocoeval.py:515-516); identical values, int counts
    def setDetParams(self):
        self.imgIds = []
        self.catIds = []
        self.iouThrs = np.linspace(0.5, 0.95, 10, endpoint=True)
        self.recThrs = np.linspace(0.0, 1.00, 101, endpoint=True)
        self.maxDets = [1, 10, 100]
        self.areaRng = [
            [0**2, 1e5**2], [0**2, 32**2], [32**2, 96**2], [96**2, 1e5**2]
        ]
        self.areaRngLbl = ["all", "small", "medium", "large"]
        self.useCats = 1

    mod.Params.setDetParams = setDetParams

    class _NPShim:
        # accumulate() uses the np.float alias removed in numpy 1.24
        float = float

        def __getattr__(self, a):
            return getattr(np, a)

    mod.np = _NPShim()
    return mod.COCOeval


def _random_scenario(rng, n_imgs=4, n_cats=3):
    """(gt_anns, results, img_ids, cat_ids) with adversarial structure."""
    img_ids = list(range(1, n_imgs + 1))
    cat_ids = list(range(1, n_cats + 1))
    gts, dts = [], []
    ann_id = 1
    W = H = 640.0
    for img in img_ids:
        if rng.rand() < 0.15:
            continue  # image with no gt at all
        for _ in range(rng.randint(0, 7)):
            # area spread across small/medium/large
            scale = rng.choice([8, 24, 64, 150, 300])
            w = max(2.0, rng.rand() * scale)
            h = max(2.0, rng.rand() * scale)
            x = rng.rand() * (W - w)
            y = rng.rand() * (H - h)
            gts.append(
                dict(
                    id=ann_id,
                    image_id=img,
                    category_id=int(rng.choice(cat_ids)),
                    bbox=[float(x), float(y), float(w), float(h)],
                    area=float(w * h),
                    iscrowd=int(rng.rand() < 0.15),
                )
            )
            ann_id += 1
    # detections: perturbed copies of gts + pure noise, with score ties
    for g in gts:
        for _ in range(rng.randint(0, 3)):
            x, y, w, h = g["bbox"]
            jx = rng.randn() * w * 0.2
            jy = rng.randn() * h * 0.2
            jw = max(2.0, w * (1 + rng.randn() * 0.25))
            jh = max(2.0, h * (1 + rng.randn() * 0.25))
            # quantized scores force exact ties
            score = round(float(rng.rand()), 1)
            cat = (
                g["category_id"]
                if rng.rand() < 0.8
                else int(rng.choice(cat_ids))
            )
            dts.append(
                dict(
                    image_id=g["image_id"],
                    category_id=cat,
                    bbox=[
                        float(np.clip(x + jx, 0, W - 2)),
                        float(np.clip(y + jy, 0, H - 2)),
                        float(jw),
                        float(jh),
                    ],
                    score=score,
                )
            )
    for _ in range(rng.randint(0, 10)):
        w = max(2.0, rng.rand() * 120)
        h = max(2.0, rng.rand() * 120)
        dts.append(
            dict(
                image_id=int(rng.choice(img_ids)),
                category_id=int(rng.choice(cat_ids)),
                bbox=[
                    float(rng.rand() * (W - w)),
                    float(rng.rand() * (H - h)),
                    float(w),
                    float(h),
                ],
                score=round(float(rng.rand()), 1),
            )
        )
    return gts, dts, img_ids, cat_ids


_STAT_KEYS = [
    "AP", "AP50", "AP75", "APs", "APm", "APl",
    "AR1", "AR10", "AR100", "ARs", "ARm", "ARl",
    "AP60", "AP70", "AP80", "AP90",
]


def _run_reference(COCOeval, gts, dts, img_ids, cat_ids):
    gt_coco = _FakeCOCO(gts, img_ids, cat_ids)
    dt_anns = [
        dict(d, id=i + 1, area=d["bbox"][2] * d["bbox"][3], iscrowd=0)
        for i, d in enumerate(dts)
    ]
    dt_coco = _FakeCOCO(dt_anns, img_ids, cat_ids)
    E = COCOeval(gt_coco, dt_coco, iouType="bbox")
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        E.evaluate()
        E.accumulate()
        E.summarize()
    return np.asarray(E.stats, np.float64)


def _run_ours(gts, dts, img_ids, cat_ids):
    ev = COCOEvaluator(_MinimalIndex(gts, img_ids, cat_ids))
    stats = ev.evaluate(list(dts), img_ids=img_ids)
    return np.asarray([stats[k] for k in _STAT_KEYS], np.float64)


@pytest.mark.parametrize("seed", range(40))
def test_random_scenarios_match(ref_cocoeval, seed):
    rng = np.random.RandomState(seed)
    gts, dts, img_ids, cat_ids = _random_scenario(
        rng, n_imgs=int(rng.randint(2, 6)), n_cats=int(rng.randint(1, 5))
    )
    want = _run_reference(ref_cocoeval, gts, dts, img_ids, cat_ids)
    got = _run_ours(gts, dts, img_ids, cat_ids)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12,
                               err_msg=str(_STAT_KEYS))


def test_edge_cases_match(ref_cocoeval):
    img_ids, cat_ids = [1, 2], [1, 2]
    # empty results
    gts = [dict(id=1, image_id=1, category_id=1,
                bbox=[10.0, 10.0, 20.0, 20.0], area=400.0, iscrowd=0)]
    want = _run_reference(ref_cocoeval, gts, [], img_ids, cat_ids)
    got = _run_ours(gts, [], img_ids, cat_ids)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # crowd-only gt
    gts = [dict(id=1, image_id=1, category_id=1,
                bbox=[10.0, 10.0, 20.0, 20.0], area=400.0, iscrowd=1)]
    dts = [dict(image_id=1, category_id=1,
                bbox=[11.0, 11.0, 20.0, 20.0], score=0.9)]
    want = _run_reference(ref_cocoeval, gts, dts, img_ids, cat_ids)
    got = _run_ours(gts, dts, img_ids, cat_ids)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # perfect single detection
    dts = [dict(image_id=1, category_id=1,
                bbox=[10.0, 10.0, 20.0, 20.0], score=1.0)]
    gts = [dict(id=1, image_id=1, category_id=1,
                bbox=[10.0, 10.0, 20.0, 20.0], area=400.0, iscrowd=0)]
    want = _run_reference(ref_cocoeval, gts, dts, img_ids, cat_ids)
    got = _run_ours(gts, dts, img_ids, cat_ids)
    np.testing.assert_allclose(got, want, atol=1e-12)
