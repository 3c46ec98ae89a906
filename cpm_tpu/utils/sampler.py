"""Fixed-shape balanced positive/negative sampling.

Reference semantics (/root/reference/pet/rcnn/utils/balanced_positive_negative_sampler.py:4-67):
randomly keep up to ``batch * positive_fraction`` positives and fill the
remainder with negatives, returning binary masks. The reference uses
``randperm`` on variable-size index sets; here selection is a rank-threshold
over random priorities so shapes stay static under jit. Loss normalization
must divide by the *true* selected counts (see SURVEY.md §7.3).
"""

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


def sample_k_from_mask(mask: jnp.ndarray, k, key) -> jnp.ndarray:
    """Uniformly select min(k, sum(mask)) elements of mask. Returns bool mask.

    k may be a traced scalar; broadcasting over leading batch dims works when
    k has matching leading dims.
    """
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
    sel_pos = sample_k_from_mask(pos_mask, num_pos, kp)
    sel_neg = sample_k_from_mask(neg_mask, num_neg, kn)
    return sel_pos, sel_neg
