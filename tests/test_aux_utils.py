"""Aux subsystem tests: proposal AR, measure, samplers, vis, lr schedule,
optimizer labels."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.evaluation.proposal_eval import evaluate_box_proposals
from cpm_tpu.data.samplers import (
    repeat_factor_indices,
    repeat_factors_from_category_frequency,
)
from cpm_tpu.solver.lr_schedule import make_lr_fn
from cpm_tpu.solver.optimizer import classify_param
from cpm_tpu.utils.measure import count_params, flops_of
from cpm_tpu.utils.vis import vis_one_image
from cpm_tpu.config import get_default_cfg


def test_proposal_ar_perfect():
    recs = [
        dict(
            boxes=np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float),
            scores=np.array([0.9, 0.8]),
            gt_boxes=np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float),
        )
    ]
    out = evaluate_box_proposals(recs)
    assert np.isclose(out["ar"], 1.0)
    assert out["num_pos"] == 2


def test_proposal_ar_partial():
    recs = [
        dict(
            boxes=np.array([[0, 0, 10, 10]], float),
            scores=np.array([0.9]),
            gt_boxes=np.array([[0, 0, 10, 10], [50, 50, 70, 70]], float),
        )
    ]
    out = evaluate_box_proposals(recs)
    assert np.isclose(out["ar"], 0.5)


def test_proposal_ar_limit():
    # low-scored perfect box beyond the limit is NOT counted
    recs = [
        dict(
            boxes=np.array([[30, 30, 35, 35], [0, 0, 10, 10]], float),
            scores=np.array([0.9, 0.1]),
            gt_boxes=np.array([[0, 0, 10, 10]], float),
        )
    ]
    out = evaluate_box_proposals(recs, limit=1)
    assert np.isclose(out["ar"], 0.0)


def test_measure_counts():
    params = {"a": {"w": jnp.zeros((3, 4))}, "b": {"w": jnp.zeros((5,))}}
    assert count_params(params) == 17
    f = flops_of(lambda x: x @ x, jnp.zeros((8, 8)))
    assert f > 0


def test_repeat_factor_sampler():
    class FakeDataset:
        # category 1 common, category 7 rare
        anns = [
            (None, np.array([1])), (None, np.array([1])),
            (None, np.array([1])), (None, np.array([7])),
        ]

        def __len__(self):
            return 4

        def load_annotations(self, i):
            return self.anns[i]

    rf = repeat_factors_from_category_frequency(
        FakeDataset(), repeat_thresh=0.5
    )
    assert rf[3] > rf[0] >= 1.0
    idx = repeat_factor_indices(rf, epoch_seed=0)
    # the rare image appears at least as often as common ones
    counts = np.bincount(idx, minlength=4)
    assert counts[3] >= counts[0]


def test_vis_draws():
    img = np.zeros((50, 60, 3), np.uint8)
    out = vis_one_image(
        img,
        np.array([[5, 5, 30, 30]]),
        np.array([0.9]),
        np.array([1]),
        score_thresh=0.5,
    )
    arr = np.asarray(out)
    assert arr.shape == (50, 60, 3)
    assert arr.sum() > 0  # something was drawn


def test_lr_schedule_step_policy():
    cfg = get_default_cfg()
    s = cfg.SOLVER
    s.BASE_LR = 0.02
    s.WARM_UP_ITERS = 10
    s.WARM_UP_FACTOR = 0.1
    s.WARM_UP_METHOD = "LINEAR"
    s.LR_POLICY = "STEP"
    s.GAMMA = 0.1
    s.STEPS = (100, 200)
    s.MAX_ITER = 300
    fn = make_lr_fn(s)
    assert float(fn(0)) < 0.02  # warming up
    np.testing.assert_allclose(float(fn(50)), 0.02, rtol=1e-6)
    np.testing.assert_allclose(float(fn(150)), 0.002, rtol=1e-6)
    np.testing.assert_allclose(float(fn(250)), 0.0002, rtol=1e-6)


def test_optimizer_param_labels():
    assert classify_param(["backbone", "conv1", "kernel"], 2) == "frozen"
    assert classify_param(["backbone", "layer1_0", "conv1", "kernel"], 2) == "frozen"
    assert classify_param(["backbone", "layer2_0", "conv1", "kernel"], 2) == "nonbias"
    assert classify_param(["backbone", "layer2_0", "AffineChannel_0", "scale"], 2) == "frozen"
    assert classify_param(["roi_head", "fc6", "bias"], 2) == "bias"
    assert classify_param(["fpn", "GroupNorm_0", "gn", "scale"], 2) == "gn"
    # reference quirk: GN bias lands in the bias group
    assert classify_param(["fpn", "GroupNorm_0", "gn", "bias"], 2) == "bias"
