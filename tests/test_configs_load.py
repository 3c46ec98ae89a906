"""Every shipped config must merge cleanly and build a model object."""

import glob
import os

import pytest

from cpm_tpu.config import get_default_cfg, merge_cfg_from_file, merge_cfg_from_list
from cpm_tpu.modeling.model import build_model

CFGS = sorted(glob.glob("cfgs/**/*.yaml", recursive=True))


@pytest.mark.parametrize("path", CFGS, ids=[os.path.basename(p) for p in CFGS])
def test_config_merges_and_builds(path):
    cfg = get_default_cfg()
    merge_cfg_from_file(path, target=cfg)
    model = build_model(cfg)
    assert model is not None


def test_cli_opts_override():
    cfg = get_default_cfg()
    merge_cfg_from_list(
        ["SOLVER.BASE_LR", "0.01", "MODEL.GRID_ON", "True"], target=cfg
    )
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.GRID_ON is True
