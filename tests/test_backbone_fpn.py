"""Backbone + FPN shape and wiring tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.config import get_default_cfg
from cpm_tpu.modeling import registry
from cpm_tpu.modeling.backbone.resnet import ResNetBody
from cpm_tpu.modeling.fpn import FPN, build_fpn, nearest_upsample_2x


def test_resnet50_shapes():
    body = ResNetBody(layers=(2, 2, 2, 2))  # shallow for test speed
    x = jnp.zeros((1, 64, 64, 3))
    params = body.init(jax.random.PRNGKey(0), x)
    feats = body.apply(params, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 1024),
        (1, 2, 2, 2048),
    ]
    assert body.dim_out == (256, 512, 1024, 2048)
    assert body.spatial_scale == (0.25, 0.125, 0.0625, 0.03125)


def test_resnext_grouped_width():
    body = ResNetBody(layers=(1, 1, 1, 1), width=4, groups=32, stride_3x3=True)
    x = jnp.zeros((1, 32, 32, 3))
    params = body.init(jax.random.PRNGKey(0), x)
    # stage-1 grouped conv width must be 128 for 32x4d
    k = params["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape[-1] == 128
    feats = body.apply(params, x)
    assert feats[-1].shape[-1] == 2048


def test_fpn_levels():
    fpn = FPN(fpn_dim=256)
    feats = [
        jnp.zeros((1, 16, 16, 256)),
        jnp.zeros((1, 8, 8, 512)),
        jnp.zeros((1, 4, 4, 1024)),
        jnp.zeros((1, 2, 2, 2048)),
    ]
    params = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(params, feats)
    assert len(outs) == 5  # P2..P6
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 256 for o in outs)


def test_nearest_upsample():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = nearest_upsample_2x(x)
    np.testing.assert_array_equal(
        y[0, :, :, 0],
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
    )


def test_registry_builders():
    cfg = get_default_cfg()
    body = registry.BACKBONES["resnet"](cfg)
    assert isinstance(body, ResNetBody)
    neck = build_fpn(cfg)
    assert isinstance(neck, FPN)


def test_deform_conv_matches_regular_when_offsets_zero():
    from cpm_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    offset = jnp.zeros((1, 8, 8, 18))
    out = deform_conv2d(x, w, offset, None, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_grouped_deform_conv_matches_grouped_regular_when_offsets_zero():
    """ResNeXt-DCN parity: the reference's deform 3x3 is GROUPED
    (resnext.py:44-46, conv_op(..., groups=C)); with zero offsets it
    must equal a grouped regular conv."""
    from cpm_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(1)
    groups = 4
    x = jnp.asarray(rng.randn(2, 8, 10, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8 // groups, 8).astype(np.float32))
    offset = jnp.zeros((2, 8, 10, 18))
    out = deform_conv2d(
        x, w, offset, None, stride=1, padding=1, groups=groups
    )
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_grouped_deform_conv_equals_blockdiag_dense_with_offsets():
    """With real offsets + v2 mask, grouped contraction == the dense
    contraction with a block-diagonal weight (pure linear-algebra
    identity, so it holds for any sampling)."""
    from cpm_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(2)
    groups, cin, cout = 2, 6, 8
    cg, cog = cin // groups, cout // groups
    x = jnp.asarray(rng.randn(1, 6, 7, cin).astype(np.float32))
    wg = rng.randn(3, 3, cg, cout).astype(np.float32)
    off = jnp.asarray(0.7 * rng.randn(1, 6, 7, 18).astype(np.float32))
    mask = jnp.asarray(
        rng.uniform(0.2, 1.0, (1, 6, 7, 9)).astype(np.float32)
    )
    dense = np.zeros((3, 3, cin, cout), np.float32)
    for o in range(cout):
        g = o // cog
        dense[:, :, g * cg : (g + 1) * cg, o] = wg[:, :, :, o]
    out_g = deform_conv2d(
        x, jnp.asarray(wg), off, mask, 1, 1, 1, groups
    )
    out_d = deform_conv2d(x, jnp.asarray(dense), off, mask, 1, 1, 1, 1)
    np.testing.assert_allclose(
        np.asarray(out_g), np.asarray(out_d), atol=1e-4
    )


def test_resnext_dcn_param_shapes_are_grouped():
    """X-101-DCN blocks declare the grouped main weight
    [3,3,width/groups,width] (matches the reference DeformConv
    parameter, deform_conv.py:398: (out, in//groups, k, k))."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    body = ResNetBody(
        layers=(1, 1, 1, 1), groups=2, width=4, stride_3x3=True,
        stage_with_conv=("normal", "deformv2", "deformv2", "deformv2"),
    )
    v = body.init(jax.random.PRNGKey(0), x)
    blk = v["params"]["layer2_0"]["conv2"]
    width = blk["conv_offset_mask"]["kernel"].shape[2]
    assert blk["weight"].shape == (3, 3, width // 2, width)
    outs = body.apply(v, x)
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_s2d_stem_matches_plain_conv1():
    # TPU.S2D_STEM computes the 7x7/2 stem as a 4x4/1 conv over 2x2
    # space-to-depth input; it must be numerically equivalent AND use
    # the identical param tree (same ('conv1','kernel') path, same init
    # rng) so checkpoints/imports/fresh-init are knob-independent.
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    plain = ResNetBody(layers=(1, 1, 1, 1))
    s2d = ResNetBody(layers=(1, 1, 1, 1), s2d_stem=True)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vs = s2d.init(jax.random.PRNGKey(0), x)
    # identical param trees (paths AND values)
    lp = jax.tree_util.tree_leaves_with_path(vp)
    ls = jax.tree_util.tree_leaves_with_path(vs)
    assert [k for k, _ in lp] == [k for k, _ in ls]
    for (k, a), (_, b) in zip(lp, ls):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))
    outs_p = plain.apply(vp, x)
    outs_s = s2d.apply(vp, x)
    for a, b in zip(outs_p, outs_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
    # odd spatial dims fall back to the plain conv (no crash, same out)
    xo = jnp.asarray(rng.rand(1, 33, 35, 3).astype(np.float32))
    o1 = plain.apply(vp, xo)
    o2 = s2d.apply(vp, xo)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_deform_conv_single_row_and_column_maps():
    """The windowed 2x2 gather needs H,W >= 2; degenerate maps must
    route through the corner fallback instead of crashing lax.gather."""
    import numpy as np

    from cpm_tpu.ops.deform_conv import deform_conv2d

    rs = np.random.RandomState(0)
    for H, W in ((1, 7), (7, 1), (1, 1)):
        x = jnp.asarray(rs.randn(1, H, W, 8).astype(np.float32))
        w = jnp.asarray(rs.randn(3, 3, 8, 8).astype(np.float32))
        off = jnp.asarray(rs.randn(1, H, W, 18).astype(np.float32))
        out = deform_conv2d(x, w, off, None, stride=1, padding=1)
        assert out.shape == (1, H, W, 8)
        assert bool(jnp.isfinite(out).all())
