"""Space-to-batch tiled grid towers (TPU.TILED_TOWERS) are exact.

The tiled path lays per-roi feature maps onto one zero-gapped canvas so
the tower's 3x3 convs and the fusion's 5x5 depthwise convs run at large
spatial extent (MXU-friendly); the zero gaps reproduce per-roi zero
padding exactly, so outputs must match the per-roi formulation to float
tolerance (conv reduction order differs) for any roi count, including
non-square grids and the degenerate R=1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.modeling.roi_heads.grid_modules import (
    GridHead,
    GridOutput,
    tile_rois,
    untile_rois,
)


def _make(tiled, num_convs=3, fused=True):
    return GridHead(
        grid_points=9,
        roi_feat_size=14,
        num_convs=num_convs,
        point_feat_channels=8,
        fused_on=fused,
        tiled=tiled,
    )


def _apply(head, params, pooled):
    return head.apply(
        {"params": params}, None, None, None, pooled=pooled
    )


@pytest.mark.parametrize("num_rois", [1, 5, 32])
def test_tiled_tower_matches_per_roi(num_rois):
    rng = np.random.RandomState(num_rois)
    pooled = jnp.asarray(
        rng.randn(num_rois, 14, 14, 16).astype(np.float32)
    )
    ref_head, tiled_head = _make(False), _make(True)
    params = ref_head.init(
        jax.random.PRNGKey(0), None, None, None, pooled=pooled
    )["params"]

    x_r, so_r, _ = _apply(ref_head, params, pooled)
    x_t, so_t, _ = _apply(tiled_head, params, pooled)
    np.testing.assert_allclose(
        np.asarray(x_t), np.asarray(x_r), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(so_t), np.asarray(so_r), rtol=1e-4, atol=1e-4
    )


def test_tiled_tower_gradients_match():
    rng = np.random.RandomState(7)
    pooled = jnp.asarray(rng.randn(6, 14, 14, 16).astype(np.float32))
    ref_head, tiled_head = _make(False, num_convs=2), _make(
        True, num_convs=2
    )
    params = ref_head.init(
        jax.random.PRNGKey(1), None, None, None, pooled=pooled
    )["params"]

    def loss(head, p, x):
        _, so, _ = _apply(head, p, x)
        return jnp.sum(so**2)

    g_r = jax.grad(lambda x: loss(ref_head, params, x))(pooled)
    g_t = jax.grad(lambda x: loss(tiled_head, params, x))(pooled)
    np.testing.assert_allclose(
        np.asarray(g_t), np.asarray(g_r), rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("num_rois", [1, 5, 32])
def test_tiled_grid_output_matches_per_roi(num_rois):
    rng = np.random.RandomState(num_rois)
    c = 8
    x = jnp.asarray(rng.randn(num_rois, 7, 7, 9 * c).astype(np.float32))
    x_so = jnp.asarray(
        rng.randn(num_rois, 7, 7, 9 * c).astype(np.float32)
    )
    mk = lambda t: GridOutput(
        grid_points=9, point_feat_channels=c, iou_helper=True, tiled=t
    )
    params = mk(False).init(jax.random.PRNGKey(0), x, x_so, train=True)[
        "params"
    ]
    hm_r, iou_r = mk(False).apply({"params": params}, x, x_so, train=True)
    hm_t, iou_t = mk(True).apply({"params": params}, x, x_so, train=True)
    for k in ("fused", "unfused"):
        np.testing.assert_allclose(
            np.asarray(hm_t[k]), np.asarray(hm_r[k]), rtol=1e-4, atol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(iou_t), np.asarray(iou_r), rtol=1e-5, atol=1e-5
    )


def test_tile_untile_roundtrip():
    rng = np.random.RandomState(0)
    for n, s, pitch in [(1, 7, 8), (5, 7, 9), (12, 14, 16)]:
        x = jnp.asarray(rng.randn(n, s, s, 3).astype(np.float32))
        canvas, grid = tile_rois(x, pitch)
        assert canvas.shape[1] % pitch == 0
        back = untile_rois(canvas[0], grid, s, pitch, n)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
