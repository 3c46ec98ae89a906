"""VGG16 reduced-fc pretrain name mapping, oracle-checked against the
reference's literal table (pet/utils/checkpointer.py:241-272) and its
weight_mapping trigger semantics (:59-72)."""

import numpy as np

from cpm_tpu.utils.weight_import import (
    apply_pretrain_name_mapping,
    vgg16_reducedfc_name_mapping,
)


def test_mapping_matches_reference_table():
    from ref_oracle import install_reference_stubs

    install_reference_stubs()
    from pet.utils.checkpointer import VGG16_NAME_MAPPING

    assert vgg16_reducedfc_name_mapping() == VGG16_NAME_MAPPING


def test_trigger_and_rename_semantics():
    sd = {k: np.full((1,), i, np.float32)
          for i, k in enumerate(vgg16_reducedfc_name_mapping())}
    # not triggered: any other filename passes through untouched
    assert apply_pretrain_name_mapping(sd, "/w/resnet50_caffe.pth") is sd
    # triggered by the filename, reference-style (checkpointer.py:61)
    out = apply_pretrain_name_mapping(sd, "/w/vgg16_reducedfc.pth")
    assert set(out) == set(vgg16_reducedfc_name_mapping().values())
    m = vgg16_reducedfc_name_mapping()
    for old, new in m.items():
        assert out[new] == sd[old]
    # strictness parity: an unknown donor key raises, as the
    # reference's mapping[old_name] lookup does
    bad = dict(sd)
    bad["999.weight"] = np.zeros((1,), np.float32)
    try:
        apply_pretrain_name_mapping(bad, "vgg16_reducedfc.pth")
    except KeyError:
        pass
    else:  # pragma: no cover
        raise AssertionError("unknown donor key should raise KeyError")


def test_load_torch_state_dict_applies_mapping(tmp_path):
    import torch

    from cpm_tpu.utils.weight_import import load_torch_state_dict

    sd = {k: torch.full((2,), float(i))
          for i, k in enumerate(vgg16_reducedfc_name_mapping())}
    p = tmp_path / "vgg16_reducedfc.pth"
    torch.save(sd, str(p))
    out = load_torch_state_dict(str(p))
    assert "conv6.weight" in out and "features2.1.bias" in out
    np.testing.assert_array_equal(
        out["features1.0.weight"], sd["0.weight"].numpy()
    )
