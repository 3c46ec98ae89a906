"""Torch-checkpoint import of deform-conv (DCN) backbones.

The reference's X-101/R-50-DCN configs put DeformConvPack /
ModulatedDeformConvPack on the bottleneck 3x3
(pet/models/imagenet/resnet.py:36-39, deform_conv.py:472-558): the main
weight is `convN.weight` and the offset predictor is a child Conv2d
`convN.conv_offset[.weight/.bias]` (v2: `conv_offset_mask`). Our flax
side names the main param "weight" (outside the USE_WS rule) with a
`conv_offset[_mask]` nn.Conv child. These tests pin the importer mapping
and the legacy-checkpoint rename shim.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_weight_parity import (  # noqa: E402
    _install_reference_stubs,
    _randomize_bn,
    _torch_sd,
)


def _reference_dcn_resnet(conv_kind: str):
    """The reference detection ResNet-50 with DCN on stages 2-4."""
    _install_reference_stubs()
    import importlib

    ref_cfg = importlib.import_module("pet.rcnn.core.config").cfg
    DR = importlib.import_module("pet.rcnn.modeling.backbone.ResNet")
    old = ref_cfg.BACKBONE.RESNET.STAGE_WITH_CONV
    ref_cfg.BACKBONE.RESNET.STAGE_WITH_CONV = (
        "normal", conv_kind, conv_kind, conv_kind
    )
    try:
        torch.manual_seed(0)
        net = DR.ResNet()
        rng = np.random.RandomState(0)
        _randomize_bn(net, rng)
        # non-zero offset weights so the import is value-checked
        for k, p in net.named_parameters():
            if "conv_offset" in k:
                p.data.copy_(torch.from_numpy(
                    rng.uniform(-0.1, 0.1, tuple(p.shape)).astype(np.float32)
                ))
        net.eval()
        return net
    finally:
        ref_cfg.BACKBONE.RESNET.STAGE_WITH_CONV = old


@pytest.mark.parametrize("conv_kind,off_name", [
    ("deform", "conv_offset"),
    ("deformv2", "conv_offset_mask"),
])
def test_dcn_backbone_import_merges_into_flax_params(conv_kind, off_name):
    import jax
    import jax.numpy as jnp

    from cpm_tpu.modeling.backbone.resnet import ResNetBody
    from cpm_tpu.utils.weight_import import (
        import_resnet_backbone_sd,
        merge_backbone_into_params,
    )

    net = _reference_dcn_resnet(conv_kind)
    sd = _torch_sd(net)
    assert f"layer2.0.conv2.{off_name}.weight" in sd  # fixture sanity

    body = ResNetBody(
        layers=(3, 4, 6, 3),
        stage_with_conv=("normal", conv_kind, conv_kind, conv_kind),
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = {"backbone": body.init(rng, x)["params"]}

    imported = import_resnet_backbone_sd(sd, layers=(3, 4, 6, 3))
    # deform blocks carry the pack structure
    blk = imported["layer2_0"]["conv2"]
    assert "weight" in blk and "kernel" not in blk
    assert off_name in blk and "bias" in blk[off_name]
    # the main weight maps OIHW->HWIO like any conv
    np.testing.assert_allclose(
        blk["weight"],
        np.transpose(sd["layer2.0.conv2.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        blk[off_name]["bias"], sd[f"layer2.0.conv2.{off_name}.bias"]
    )
    # merge must succeed against the real model tree (shape+name check)
    merged = merge_backbone_into_params(params, imported)
    got = np.asarray(merged["backbone"]["layer3_1"]["conv2"][off_name]["kernel"])
    want = np.transpose(sd[f"layer3.1.conv2.{off_name}.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    # stage-1 (plain) blocks still import as kernel
    assert "kernel" in imported["layer1_0"]["conv2"]


def test_checkpoint_legacy_deform_rename_shim(tmp_path):
    """Checkpoints saved before the kernel->weight rename still load:
    the shim presents deform 'weight' leaves to orbax as 'kernel'."""
    from cpm_tpu.engine.checkpoint import CheckPointer

    legacy_state = {
        "params": {
            "conv1": {"kernel": np.ones((3, 3, 3, 8), np.float32)},
            "layer2_0": {
                "conv2": {
                    "kernel": np.full((3, 3, 8, 8), 2.0, np.float32),
                    "conv_offset": {
                        "kernel": np.full((3, 3, 8, 18), 3.0, np.float32),
                        "bias": np.zeros((18,), np.float32),
                    },
                },
            },
        },
        "step": np.zeros((), np.int32) + 7,
    }
    ck = CheckPointer(str(tmp_path / "ckpt"))
    ck.save(legacy_state, step=7)

    new_state = {
        "params": {
            "conv1": {"kernel": np.zeros((3, 3, 3, 8), np.float32)},
            "layer2_0": {
                "conv2": {
                    "weight": np.zeros((3, 3, 8, 8), np.float32),
                    "conv_offset": {
                        "kernel": np.zeros((3, 3, 8, 18), np.float32),
                        "bias": np.zeros((18,), np.float32),
                    },
                },
            },
        },
        "step": np.zeros((), np.int32),
    }
    ck2 = CheckPointer(str(tmp_path / "ckpt"))
    restored = ck2.load(new_state)
    assert restored is not None
    conv2 = restored["params"]["layer2_0"]["conv2"]
    assert "weight" in conv2 and "kernel" not in conv2
    np.testing.assert_allclose(np.asarray(conv2["weight"]), 2.0)
    assert int(restored["step"]) == 7
