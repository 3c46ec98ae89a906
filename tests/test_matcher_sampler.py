import numpy as np
import jax
import jax.numpy as jnp

from cpm_tpu.utils.matcher import (
    BELOW_LOW_THRESHOLD,
    BETWEEN_THRESHOLDS,
    match_boxes,
)
from cpm_tpu.utils.sampler import balanced_sample


def _np_match(quality, high, low, allow_low_quality):
    """Reference Matcher (matcher.py:45-111) in numpy."""
    matched_vals = quality.max(axis=0)
    matches = quality.argmax(axis=0)
    all_matches = matches.copy()
    matches = np.where(matched_vals < low, BELOW_LOW_THRESHOLD, matches)
    matches = np.where(
        (matched_vals >= low) & (matched_vals < high), BETWEEN_THRESHOLDS, matches
    )
    if allow_low_quality:
        highest_per_gt = quality.max(axis=1)
        gt_idx, pred_idx = np.nonzero(quality == highest_per_gt[:, None])
        matches[pred_idx] = all_matches[pred_idx]
    return matches


def test_matcher_matches_reference(rng):
    for allow in (False, True):
        q = rng.rand(6, 40).astype(np.float32)
        gt_mask = np.ones(6, bool)
        got = np.asarray(
            match_boxes(jnp.asarray(q), jnp.asarray(gt_mask), 0.7, 0.3, allow)
        )
        want = _np_match(q, 0.7, 0.3, allow)
        np.testing.assert_array_equal(got, want)


def test_matcher_padded_gt_rows_ignored(rng):
    q = rng.rand(6, 20).astype(np.float32)
    gt_mask = np.array([True, True, True, False, False, False])
    got = np.asarray(
        match_boxes(jnp.asarray(q), jnp.asarray(gt_mask), 0.7, 0.3, False)
    )
    want = _np_match(q[:3], 0.7, 0.3, False)
    np.testing.assert_array_equal(got, want)


def test_balanced_sample_counts(rng):
    n = 200
    pos = jnp.asarray(rng.rand(n) < 0.4)
    neg = jnp.asarray(~np.asarray(pos) & (rng.rand(n) < 0.9))
    key = jax.random.PRNGKey(0)
    sp, sn = balanced_sample(pos, neg, 64, 0.25, key)
    sp, sn = np.asarray(sp), np.asarray(sn)
    assert sp.sum() == min(int(np.asarray(pos).sum()), 16)
    assert sn.sum() == min(int(np.asarray(neg).sum()), 64 - sp.sum())
    assert not np.any(sp & ~np.asarray(pos))
    assert not np.any(sn & ~np.asarray(neg))


def test_balanced_sample_few_positives(rng):
    n = 100
    pos = np.zeros(n, bool)
    pos[:3] = True
    neg = ~pos
    sp, sn = balanced_sample(
        jnp.asarray(pos), jnp.asarray(neg), 64, 0.25, jax.random.PRNGKey(1)
    )
    assert int(np.asarray(sp).sum()) == 3
    assert int(np.asarray(sn).sum()) == 61


def test_sample_k_topk_path_uniform_and_exact_count(rng):
    """The top_k-threshold selection must pick exactly min(k, avail)
    elements, uniformly."""
    import jax

    from cpm_tpu.utils.sampler import sample_k_from_mask

    mask = jnp.asarray(rng.rand(1000) < 0.5)
    avail = int(np.asarray(mask).sum())
    counts = np.zeros(1000)
    for s in range(200):
        sel = sample_k_from_mask(mask, 64, jax.random.PRNGKey(s), k_max=64)
        sel = np.asarray(sel)
        assert sel.sum() == 64
        assert not (sel & ~np.asarray(mask)).any()
        counts += sel
    # each masked element selected with p = 64/avail; loose 5-sigma band
    p = 64 / avail
    sigma = np.sqrt(200 * p * (1 - p))
    sel_counts = counts[np.asarray(mask)]
    assert abs(sel_counts.mean() - 200 * p) < 3 * sigma / np.sqrt(avail) * 10
    assert (np.abs(sel_counts - 200 * p) < 5 * sigma + 1).all()

    # traced k smaller than available; k=0 selects nothing
    sel = sample_k_from_mask(mask, jnp.asarray(10), jax.random.PRNGKey(0),
                             k_max=64)
    assert int(np.asarray(sel).sum()) == 10
    sel0 = sample_k_from_mask(mask, jnp.asarray(0), jax.random.PRNGKey(0),
                              k_max=64)
    assert int(np.asarray(sel0).sum()) == 0
    # k exceeding available selects all available
    tiny = jnp.asarray(np.arange(1000) < 5)
    sel_all = sample_k_from_mask(tiny, jnp.asarray(64), jax.random.PRNGKey(1),
                                 k_max=64)
    assert int(np.asarray(sel_all).sum()) == 5


def test_matcher_matches_reference_torch():
    """match_boxes vs the reference's own Matcher (pet/rcnn/utils/
    matcher.py, pure torch), incl. low-quality match recovery and the
    BELOW_LOW/BETWEEN sentinels."""
    import importlib
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    RM = importlib.import_module("pet.rcnn.utils.matcher")

    from cpm_tpu.utils.matcher import match_boxes

    rng = np.random.RandomState(23)
    M, N = 7, 400
    for allow_low in (True, False):
        for trial in range(5):
            q = rng.rand(M, N).astype(np.float32)
            # sprinkle exact ties and sub-threshold columns
            q[:, : N // 4] *= 0.25
            q[0, 5] = q[1, 5]
            ref = RM.Matcher(0.7, 0.3, allow_low_quality_matches=allow_low)
            want = ref(torch.from_numpy(q)).numpy()
            got = np.asarray(match_boxes(
                jnp.asarray(q)[None], jnp.ones((1, M), bool),
                0.7, 0.3, allow_low_quality_matches=allow_low,
            ))[0]
            # sentinel semantics: ours uses the same -1/-2 coding
            np.testing.assert_array_equal(got, want, err_msg=(
                f"allow_low={allow_low} trial={trial}"
            ))
