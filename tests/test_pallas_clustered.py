"""Cluster-batched Pallas multilevel RoIAlign vs the XLA gather path.

Runs in Pallas interpreter mode on the CPU test rig; on-chip timing via
tools/probe_pooler_crossroi.py / bench_roi_align.py. The clustered
forward must be numerically identical to the per-roi windowed kernel's
contract: exact vs gather for in-window rois, zeros for masked rois,
singleton fallback (own window) for rois whose hat support exceeds the
shared-window slack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.ops.pallas.clustered_pallas import (
    _cluster,
    multilevel_roi_align_clustered,
)
from cpm_tpu.ops.pallas.multilevel_pallas import _prep_rois, _unpack_rois_levels
from cpm_tpu.ops.roi_align import multilevel_roi_align

SCALES = (0.25, 0.125, 0.0625, 0.03125)
SHAPES = [(56, 80), (28, 40), (14, 20), (7, 10)]


def _setup(seed=0, R=48, B=2, C=8, clustered=False):
    rng = np.random.RandomState(seed)
    feats = [
        jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
        for h, w in SHAPES
    ]
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = rng.randint(0, B, R)
    if clustered:
        # many rois packed into a few neighborhoods -> real group sharing
        cx = rng.choice([40.0, 90.0, 150.0], R)
        cy = rng.choice([30.0, 80.0], R)
        x1 = cx + rng.rand(R) * 20
        y1 = cy + rng.rand(R) * 16
    else:
        x1 = rng.rand(R) * 180
        y1 = rng.rand(R) * 120
    rois[:, 1], rois[:, 2] = x1, y1
    rois[:, 3] = x1 + rng.rand(R) * 130 + 4
    rois[:, 4] = y1 + rng.rand(R) * 90 + 4
    levels = rng.randint(0, 4, R).astype(np.int32)
    return feats, jnp.asarray(rois), jnp.asarray(levels)


@pytest.mark.parametrize("pool", [(7, 7), (14, 14)])
@pytest.mark.parametrize("clustered", [False, True])
def test_clustered_forward_matches_gather(pool, clustered):
    feats, rois, levels = _setup(clustered=clustered)
    want = multilevel_roi_align(feats, rois, levels, pool, SCALES, 2)
    got = multilevel_roi_align_clustered(
        tuple(feats), (rois, levels), pool, SCALES, 2, False, True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_clustered_groups_form():
    """Clustered roi sets actually produce multi-roi groups (the kernel
    exercises the batched path, not just singletons)."""
    feats, rois, levels = _setup(clustered=True, R=64)
    rl = (rois, levels)
    rois_u, levels_u, valid = _unpack_rois_levels(rl)
    level_hw = tuple((int(f.shape[1]), int(f.shape[2])) for f in feats)
    batch, y0, x0, ys, xs, need_r, need_c = _prep_rois(
        rois_u, levels_u, SCALES, level_hw, level_hw, (7, 7), 2, False,
    )
    out = _cluster(levels_u, batch, y0, x0, need_r, need_c, valid,
                   level_hw, 8)
    gsize = np.asarray(out[9])
    assert gsize.sum() == 64
    assert (gsize >= 2).any(), "no multi-roi groups formed"


def test_clustered_masked_rois_zero():
    feats, rois, levels = _setup(R=32)
    valid = jnp.asarray((np.arange(32) % 3) != 0)
    got = multilevel_roi_align_clustered(
        tuple(feats), (rois, levels, valid), (7, 7), SCALES, 2, False,
        True,
    )
    want = multilevel_roi_align(feats, rois, levels, (7, 7), SCALES, 2)
    got, want = np.asarray(got), np.asarray(want)
    v = np.asarray(valid)
    assert np.abs(got[~v]).max() == 0.0
    np.testing.assert_allclose(got[v], want[v], rtol=1e-5, atol=1e-5)


def test_clustered_backward_matches_gather():
    feats, rois, levels = _setup(seed=3, R=24, clustered=True)
    pool = (7, 7)

    def loss_clustered(fs):
        out = multilevel_roi_align_clustered(
            tuple(fs), (rois, levels), pool, SCALES, 2, False, True
        )
        return jnp.sum(out * out)

    def loss_gather(fs):
        out = multilevel_roi_align(fs, rois, levels, pool, SCALES, 2)
        return jnp.sum(out * out)

    g_c = jax.grad(loss_clustered)(list(feats))
    g_g = jax.grad(loss_gather)(list(feats))
    for i, (gp, gg) in enumerate(zip(g_c, g_g)):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gg), rtol=1e-4, atol=1e-4,
            err_msg=f"level {i}",
        )


def test_clustered_extreme_aspect_singleton_fallback():
    """Very wide rois exceed the shared-window slack -> singleton
    groups with their own window; numerics must still match gather
    (same in-window guarantee as the windowed kernel)."""
    rng = np.random.RandomState(5)
    C = 8
    feats = [
        jnp.asarray(rng.randn(2, h, w, C).astype(np.float32))
        for h, w in SHAPES
    ]
    R = 12
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = rng.randint(0, 2, R)
    x1 = rng.rand(R) * 60
    y1 = rng.rand(R) * 120
    rois[:, 1], rois[:, 2] = x1, y1
    rois[:, 3] = x1 + 200 + rng.rand(R) * 30  # aspect ~3-6
    rois[:, 4] = y1 + 40 + rng.rand(R) * 10
    levels = np.full(R, 1, np.int32)  # stride 8: extent ~25-29 cells
    want = multilevel_roi_align(
        feats, jnp.asarray(rois), jnp.asarray(levels), (7, 7), SCALES, 2
    )
    got = multilevel_roi_align_clustered(
        tuple(feats), (jnp.asarray(rois), jnp.asarray(levels)),
        (7, 7), SCALES, 2, False, True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
