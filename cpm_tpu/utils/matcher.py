"""Vectorized anchor/proposal <-> ground-truth matcher.

Semantics of the reference Matcher (/root/reference/pet/rcnn/utils/matcher.py:4-111)
— argmax over the gt axis, BELOW_LOW (-1) / BETWEEN (-2) sentinels, and the
low-quality-match recovery pass — rebuilt as a single fixed-shape function
(no data-dependent shapes; padded gt rows are masked to quality -inf).
"""

import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_boxes(
    quality: jnp.ndarray,
    gt_mask: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
):
    """Match each of N predictions to one of M (padded) ground truths.

    Args:
      quality: [..., M, N] pairwise match quality (IoU), rows = gt.
      gt_mask: [..., M] bool; False rows are padding and can never match.
      high_threshold / low_threshold: stratification thresholds.
      allow_low_quality_matches: per-gt best-prediction recovery
        (matcher.py:82-111), including ties.

    Returns:
      matches: [..., N] int32; gt index in [0, M) or a negative sentinel.
    """
    neg_inf = jnp.finfo(quality.dtype).min
    q = jnp.where(gt_mask[..., :, None], quality, neg_inf)

    matched_vals = jnp.max(q, axis=-2)  # [..., N]
    all_matches = jnp.argmax(q, axis=-2).astype(jnp.int32)  # [..., N]

    below_low = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    matches = jnp.where(below_low, BELOW_LOW_THRESHOLD, all_matches)
    matches = jnp.where(between, BETWEEN_THRESHOLDS, matches)

    if allow_low_quality_matches:
        # For each gt, max quality over predictions; any prediction tied at
        # that max gets restored to its argmax gt (reference includes ties).
        highest_per_gt = jnp.max(q, axis=-1, keepdims=True)  # [..., M, 1]
        is_best = (q == highest_per_gt) & gt_mask[..., :, None]
        # a prediction is "recovered" if it ties the per-gt max for any gt
        recovered = jnp.any(is_best, axis=-2)  # [..., N]
        matches = jnp.where(recovered, all_matches, matches)

    return matches
