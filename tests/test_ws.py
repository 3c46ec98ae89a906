"""USE_WS (weight standardization) parity tests.

The reference rewrites every nn.Conv2d in a gated module into Conv2dWS
(convert_conv2convws_model, pet/models/imagenet/utils.py:51-68; standardize
numerics at pet/lib/ops/conv2d_ws.py:12-19). Here the same knobs lift the
Flax module with a params transform (cpm_tpu/modeling/ws.py). These tests
pin: kernel-standardization numerics vs torch, whole-FPN activation parity
vs the converted reference module, param-tree invariance (checkpoints stay
interchangeable), and that a model built with every USE_WS flag on runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_oracle import install_reference_stubs


def _torch():
    install_reference_stubs()
    import torch

    return torch


def _torch_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_ws_kernel_matches_torch_conv2dws():
    torch = _torch()
    from pet.lib.ops.conv2d_ws import Conv2dWS

    from cpm_tpu.modeling.ws import ws_standardize_kernel

    torch.manual_seed(0)
    m = Conv2dWS(5, 7, 3, padding=1).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 9, 9).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()

    # standardize the kernel ourselves (HWIO), then plain conv
    k = m.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
    ks = ws_standardize_kernel(jnp.asarray(k))
    y = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        ks,
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(m.bias.detach().numpy())
    got = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ws_fpn_activation_parity():
    """Our FPN with FPN.USE_WS == the reference FPN through
    convert_conv2convws_model, identical weights."""
    torch = _torch()
    import importlib

    FM = importlib.import_module("pet.rcnn.modeling.fpn.FPN")
    utils = importlib.import_module("pet.models.imagenet.utils")
    from pet.rcnn.core.config import cfg as ref_cfg

    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling.fpn import build_fpn
    from cpm_tpu.utils.weight_import import import_fpn

    dim_in = [16, 32, 64, 128]
    spatial = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
    ref_cfg.immutable(False)
    old_dim = ref_cfg.FPN.DIM
    ref_cfg.FPN.DIM = 32
    try:
        torch.manual_seed(0)
        ref = FM.fpn(dim_in, list(spatial))
        ref = utils.convert_conv2convws_model(ref)
        ref.eval()
        rng = np.random.RandomState(1)
        feats = [
            rng.randn(2, c, 32 // (2**i), 48 // (2**i)).astype(np.float32)
            for i, c in enumerate(dim_in)
        ]
        with torch.no_grad():
            want = ref([torch.from_numpy(f) for f in feats])

        cfg = get_default_cfg()
        cfg.MODEL.FPN_ON = True
        cfg.FPN.DIM = 32
        cfg.FPN.USE_WS = True
        ours = build_fpn(cfg)
        params = {"fpn": import_fpn(_torch_sd(ref))}
        got = ours.apply(
            {"params": params["fpn"]},
            [jnp.asarray(np.transpose(f, (0, 2, 3, 1))) for f in feats],
        )
        assert len(got) == len(want)
        for i, (g, w) in enumerate(zip(got, want)):
            g = np.transpose(np.asarray(g), (0, 3, 1, 2))
            w = w.detach().numpy()
            np.testing.assert_allclose(
                g, w, rtol=2e-3,
                atol=1e-4 * max(1.0, float(np.abs(w).max())),
                err_msg=f"P{i + 2}",
            )
    finally:
        ref_cfg.FPN.DIM = old_dim


def test_ws_param_tree_invariant():
    """USE_WS keeps the param-tree structure and names identical to the
    plain FPN (checkpoints/importers unaffected). Stored kernels at fresh
    init are the standardized draws (map_variables init=True — see
    cpm_tpu/modeling/ws.py docstring); non-kernel leaves are identical."""
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling.fpn import build_fpn
    from cpm_tpu.modeling.ws import ws_standardize_kernel

    feats = [
        jnp.zeros((1, 16 // (2**0), 16, 8)),
        jnp.zeros((1, 8, 8, 16)),
        jnp.zeros((1, 4, 4, 32)),
        jnp.zeros((1, 2, 2, 64)),
    ]
    trees = []
    for use_ws in (False, True):
        cfg = get_default_cfg()
        cfg.MODEL.FPN_ON = True
        cfg.FPN.DIM = 16
        cfg.FPN.USE_WS = use_ws
        m = build_fpn(cfg)
        trees.append(m.init(jax.random.PRNGKey(7), feats)["params"])
    flat0 = jax.tree_util.tree_leaves_with_path(trees[0])
    flat1 = jax.tree_util.tree_leaves_with_path(trees[1])
    assert [p for p, _ in flat0] == [p for p, _ in flat1]
    for (path, a), (_, b) in zip(flat0, flat1):
        a, b = np.asarray(a), np.asarray(b)
        if getattr(path[-1], "key", None) == "kernel" and a.ndim == 4:
            np.testing.assert_allclose(
                np.asarray(ws_standardize_kernel(jnp.asarray(a))), b,
                rtol=1e-6, atol=1e-7,
            )
            # and the transform is idempotent up to the 1e-5 std eps
            # (relative shift ~eps/std), so the effective forward weight
            # matches the reference's
            np.testing.assert_allclose(
                np.asarray(ws_standardize_kernel(jnp.asarray(b))), b,
                rtol=1e-3, atol=1e-4,
            )
        else:
            np.testing.assert_array_equal(a, b)


def test_ws_model_builds_and_runs():
    """All USE_WS knobs on -> tiny CPM model still initializes and runs a
    forward; the MLP-head knobs are accepted no-ops like the reference."""
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling.model import build_model

    cfg = get_default_cfg()
    cfg.MODEL.FPN_ON = True
    cfg.MODEL.FASTER_RCNN = True
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.RPN_ONLY = False
    cfg.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.BACKBONE.RESNET.LAYERS = (1, 1, 1, 1)
    cfg.BACKBONE.RESNET.BASE_PLANES = 8
    cfg.FPN.DIM = 16
    cfg.FAST_RCNN.MLP_HEAD.MLP_DIM = 32
    cfg.RPN.PRE_NMS_TOP_N_TEST = 16
    cfg.RPN.POST_NMS_TOP_N_TEST = 8
    cfg.RPN.FPN_POST_NMS_TOP_N_TEST = 12
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.BACKBONE.RESNET.USE_WS = True
    cfg.FPN.USE_WS = True
    cfg.FAST_RCNN.MLP_HEAD.USE_WS = True
    cfg.FAST_RCNN.CONVFC_HEAD.USE_WS = True
    cfg.GRID_RCNN.MLP_HEAD.USE_WS = True

    model = build_model(cfg)
    images = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.array([[64, 64]])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, sizes, train=False,
    )
    out = model.apply(variables, images, sizes, train=False)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))


def test_ws_skips_deform_main_weight():
    """USE_WS must standardize the offset-predicting conv inside
    DeformConvPack but never the deform main weight — the reference's
    convert_conv2convws_model converts isinstance(_ConvNd) modules only,
    and DeformConv subclasses plain nn.Module (deform_conv.py:472-511),
    so only its child conv_offset is rewritten. Oracle: run the actual
    reference conversion and compare scopes."""
    torch = _torch()
    import importlib

    ref_dc = importlib.import_module("pet.lib.ops.deform_conv")
    utils = importlib.import_module("pet.models.imagenet.utils")
    from pet.lib.ops.conv2d_ws import Conv2dWS

    torch.manual_seed(0)
    ref = ref_dc.DeformConvPack(8, 8, 3, padding=1)
    before = ref.weight.data.clone()
    conv = utils.convert_conv2convws_model(ref)
    # reference scope: the pack itself survives untouched, only the
    # child nn.Conv2d became Conv2dWS
    assert type(conv) is ref_dc.DeformConvPack
    assert isinstance(conv.conv_offset, Conv2dWS)
    assert torch.equal(conv.weight.data, before)

    # our side: the lifted transform applies the same scope rule
    from flax import linen as nn

    from cpm_tpu.modeling.ws import (
        _standardize_tree,
        maybe_ws,
        ws_standardize_kernel,
    )
    from cpm_tpu.ops.deform_conv import DeformConvPack

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return DeformConvPack(8, 3, name="dconv")(x)

    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 8), jnp.float32)
    params = Tiny().init(jax.random.PRNGKey(0), x)["params"]
    seen = _standardize_tree({"params": params})["params"]
    # deform main weight untouched, offset conv kernel standardized
    np.testing.assert_array_equal(
        np.asarray(seen["dconv"]["weight"]),
        np.asarray(params["dconv"]["weight"]),
    )
    np.testing.assert_allclose(
        np.asarray(seen["dconv"]["conv_offset"]["kernel"]),
        np.asarray(
            ws_standardize_kernel(params["dconv"]["conv_offset"]["kernel"])
        ),
        rtol=1e-6, atol=1e-7,
    )
    # functional: lifted module == plain module fed the selectively
    # standardized params (offset kernel only)
    lifted = maybe_ws(Tiny, True)()
    manual = jax.tree_util.tree_map(lambda a: a, params)  # copy
    manual["dconv"]["conv_offset"]["kernel"] = ws_standardize_kernel(
        params["dconv"]["conv_offset"]["kernel"]
    )
    got = lifted.apply({"params": params}, x)
    want = Tiny().apply({"params": manual}, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
