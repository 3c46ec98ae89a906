import os
import textwrap

import pytest

from cpm_tpu.config import (
    get_default_cfg,
    merge_cfg_from_file,
    merge_cfg_from_list,
)


def test_defaults_present():
    c = get_default_cfg()
    assert c.RPN.FG_IOU_THRESHOLD == 0.7
    assert c.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_NUM == 3
    assert c.FAST_RCNN.BBOX_REG_WEIGHTS == (10.0, 10.0, 5.0, 5.0)
    assert c.SOLVER.WARM_UP_METHOD == "LINEAR"


def test_yaml_merge_with_tuple_coercion(tmp_path):
    y = tmp_path / "t.yaml"
    y.write_text(
        textwrap.dedent(
            """
            MODEL:
              FPN_ON: True
              NUM_CLASSES: 81
            TRAIN:
              SCALES: (800,)
              MAX_SIZE: 1333
            RPN:
              ANCHOR_STRIDE: (4, 8, 16, 32, 64)
            SOLVER:
              BASE_LR: 0.02
            """
        )
    )
    c = get_default_cfg()
    merge_cfg_from_file(str(y), c)
    assert c.MODEL.FPN_ON is True
    assert c.TRAIN.SCALES == (800,)
    assert c.RPN.ANCHOR_STRIDE == (4, 8, 16, 32, 64)
    assert c.SOLVER.BASE_LR == 0.02


def test_unknown_key_raises(tmp_path):
    y = tmp_path / "bad.yaml"
    y.write_text("MODEL:\n  NOT_A_KEY: 1\n")
    c = get_default_cfg()
    with pytest.raises(KeyError):
        merge_cfg_from_file(str(y), c)


def test_merge_from_list():
    c = get_default_cfg()
    merge_cfg_from_list(["SOLVER.BASE_LR", "0.01", "TRAIN.SCALES", "(640,)"], c)
    assert c.SOLVER.BASE_LR == 0.01
    assert c.TRAIN.SCALES == (640,)


def test_immutable_latch():
    c = get_default_cfg()
    c.immutable(True)
    with pytest.raises(AttributeError):
        c.SOLVER.BASE_LR = 1.0
    c.immutable(False)
    c.SOLVER.BASE_LR = 1.0


def test_reference_yaml_configs_load():
    """Every shipped grid_cascade YAML must merge cleanly (API parity)."""
    root = os.path.join(os.path.dirname(__file__), "..", "cfgs")
    count = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".yaml"):
                c = get_default_cfg()
                merge_cfg_from_file(os.path.join(dirpath, f), c)
                count += 1
    assert count >= 1
