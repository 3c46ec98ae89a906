"""Pallas RoIAlign kernel vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from cpm_tpu.ops.roi_align import roi_align
from cpm_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_fwd


def _run_kernel(*args):
    if jax.default_backend() == "tpu":
        # interpret mode executes op-by-op through the backend — minutes
        # per test over a tunneled TPU
        pytest.skip("interpret-mode kernel test; run on the CPU rig")
    # Always interpret mode: this single-level kernel is a superseded
    # round-1 formulation kept for reference only (production pooling
    # goes through ops/pallas/multilevel_pallas.py for FPN and the XLA
    # gather for single-level; nothing imports roi_align_pallas). Its
    # row-DMA slices are not Mosaic-aligned at arbitrary W/C, so it does
    # not compile on real hardware for these tiny test shapes — the
    # hardware-validated kernels are covered by test_pallas_multilevel
    # / test_pallas_clustered under CPM_TEST_TPU=1.
    with pltpu.force_tpu_interpret_mode():
        return roi_align_pallas_fwd(*args)


@pytest.mark.parametrize("scale", [0.25, 0.125])
def test_pallas_matches_reference(scale):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 16, 24, 32).astype(np.float32))
    rois = jnp.asarray(
        np.array(
            [
                [0, 4, 4, 40, 40],
                [1, 0, 0, 90, 60],
                [0, 10, 20, 30, 28],
                [1, 33, 17, 64, 51],
            ],
            np.float32,
        )
    )
    want = roi_align(feats, rois, (7, 7), scale, 2)
    got = _run_kernel(feats, rois, (7, 7), scale, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_pallas_14x14():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    rois = jnp.asarray(
        np.array([[0, 2, 2, 28, 28], [0, 0, 0, 10, 16]], np.float32)
    )
    want = roi_align(feats, rois, (14, 14), 0.25, 2)
    got = _run_kernel(feats, rois, (14, 14), 0.25, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )
