"""Dataset/model converter scripts (tools/scripts/) — pure-function tests."""

import json
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.scripts.coco_model_to_cityscapes import (  # noqa: E402
    CITYSCAPES_TO_COCO,
    NUM_CS_CLS,
    remap_class_axis,
)
from tools.scripts.convert_selective_search import (  # noqa: E402
    matlab_boxes_to_xyxy,
)


def test_remap_class_axis_cls_kernel():
    rng = np.random.RandomState(0)
    kernel = rng.randn(1024, 81).astype(np.float32)  # Dense [in, out]
    out = remap_class_axis(kernel, axis=1, factor=1)
    assert out.shape == (1024, NUM_CS_CLS)
    for cs_id, coco_id in CITYSCAPES_TO_COCO.items():
        np.testing.assert_array_equal(out[:, cs_id], kernel[:, coco_id])


def test_remap_class_axis_box_bias():
    rng = np.random.RandomState(1)
    bias = rng.randn(4 * 81).astype(np.float32)
    out = remap_class_axis(bias, axis=0, factor=4)
    assert out.shape == (4 * NUM_CS_CLS,)
    # rider (cs 2) maps to person (coco 1): its 4 box entries are copied
    np.testing.assert_array_equal(out[8:12], bias[4:8])


def test_matlab_boxes_to_xyxy():
    raw = np.array([[2, 3, 12, 23]])  # (y1, x1, y2, x2), 1-based
    out = matlab_boxes_to_xyxy(raw)
    np.testing.assert_array_equal(out, [[2, 1, 22, 11]])


def test_competition_zip_roundtrip(tmp_path):
    results = [
        dict(image_id=1, category_id=3, bbox=[1.0, 2.0, 3.0, 4.0],
             score=0.9)
    ]
    src = tmp_path / "bbox.json"
    src.write_text(json.dumps(results))
    out = tmp_path / "sub.zip"
    import subprocess

    rc = subprocess.run(
        [sys.executable, "tools/scripts/encode_results_for_competition.py",
         "--results", str(src), "--out", str(out)],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
        assert names == ["detections_test-dev2017_bbox_results.json"]
        assert json.loads(z.read(names[0])) == results
