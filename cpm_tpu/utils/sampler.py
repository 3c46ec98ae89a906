"""Fixed-shape balanced positive/negative sampling.

Reference semantics (/root/reference/pet/rcnn/utils/balanced_positive_negative_sampler.py:4-67):
randomly keep up to ``batch * positive_fraction`` positives and fill the
remainder with negatives, returning binary masks. The reference uses
``randperm`` on variable-size index sets; here selection is a rank-threshold
over random priorities so shapes stay static under jit. Loss normalization
must divide by the *true* selected counts (see SURVEY.md §7.3).
"""

import math

import jax
import jax.numpy as jnp


def _random_rank(mask: jnp.ndarray, key) -> jnp.ndarray:
    """Rank of each element among `mask` elements under a random shuffle.

    Elements outside the mask get rank >= num_valid.
    """
    noise = jax.random.uniform(key, mask.shape)
    priority = jnp.where(mask, noise, jnp.inf)
    order = jnp.argsort(priority, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    return rank


def sample_k_from_mask(mask: jnp.ndarray, k, key, k_max=None) -> jnp.ndarray:
    """Uniformly select min(k, sum(mask)) elements of mask. Returns bool mask.

    k may be a traced scalar (with optional leading batch dims). When a
    static upper bound `k_max` is known (or k itself is a python int), the
    selection runs as `priority <= k-th smallest priority` via lax.top_k —
    the TPU TopK custom call — instead of a double argsort over the whole
    axis (RPN samples 256 of ~280k anchors; two full sorts of 280k keys
    cost ~8 ms/step each on v5e, the top-256 custom call microseconds).
    """
    noise = jax.random.uniform(key, mask.shape)
    priority = jnp.where(mask, noise, jnp.inf)
    if k_max is None and isinstance(k, int):
        k_max = k
    if k_max is not None:
        kk = min(int(k_max), mask.shape[-1])
        if kk <= 0:
            return jnp.zeros_like(mask)
        n = mask.shape[-1]
        # Exactly-min(k, sum(mask)) selection: scatter the first k of the
        # top_k *indices* (distinct positions by construction) instead of
        # thresholding `priority <= kth` — float32 noise over ~280k anchors
        # ties at the kth value on ~3% of RPN steps, which would overshoot k.
        vals, idx = jax.lax.top_k(-priority, kk)  # ascending priority
        k_arr = jnp.broadcast_to(jnp.asarray(k), mask.shape[:-1])
        flat_rows = math.prod(mask.shape[:-1]) if mask.ndim > 1 else 1
        vals2 = vals.reshape(flat_rows, kk)
        idx2 = idx.reshape(flat_rows, kk)
        take = (
            jnp.arange(kk)[None, :] < k_arr.reshape(flat_rows)[:, None]
        ) & jnp.isfinite(vals2)  # -inf = unmasked source
        rows = jnp.arange(flat_rows)[:, None]
        sel = jnp.zeros((flat_rows, n), bool).at[rows, idx2].set(take)
        return sel.reshape(mask.shape)
    rank = _random_rank(mask, key)
    if jnp.ndim(k) > 0:
        k = k[..., None]
    return mask & (rank < k)


def balanced_sample(
    pos_mask: jnp.ndarray,
    neg_mask: jnp.ndarray,
    batch_size_per_image: int,
    positive_fraction: float,
    key,
):
    """Select positives/negatives as binary masks.

    Args:
      pos_mask / neg_mask: [..., N] bool candidate masks.
      batch_size_per_image: total samples per image.
      positive_fraction: target fraction of positives.
      key: PRNG key.

    Returns:
      (selected_pos [..., N] bool, selected_neg [..., N] bool)
    """
    kp, kn = jax.random.split(key)
    max_pos = int(batch_size_per_image * positive_fraction)
    n_pos_avail = jnp.sum(pos_mask.astype(jnp.int32), axis=-1)
    n_neg_avail = jnp.sum(neg_mask.astype(jnp.int32), axis=-1)
    num_pos = jnp.minimum(n_pos_avail, max_pos)
    num_neg = jnp.minimum(n_neg_avail, batch_size_per_image - num_pos)
    sel_pos = sample_k_from_mask(pos_mask, num_pos, kp, k_max=max_pos)
    sel_neg = sample_k_from_mask(
        neg_mask, num_neg, kn, k_max=batch_size_per_image
    )
    return sel_pos, sel_neg
