"""Probe: scatter-add formulations for the DCN backward at res3 geometry.

grad_feat[b, idx_p] += g_p * w_p for P = Ho*Wo*K samples x 4 corners.
Candidates: XLA scatter-add (unsorted / pre-sorted), segment_sum
(sorted ids), and a one-shot combined 4-corner scatter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    B, H, W, C = 2, 104, 168, 256
    K = 9
    P = H * W * K
    HW = H * W
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, HW, (B, P)).astype(np.int32))
    vals = jnp.asarray(rs.randn(B, P, C).astype(np.float32), jnp.bfloat16)

    def timed(fn, *a):
        float(fn(*a))
        t0 = time.time()
        float(fn(*a))
        return (time.time() - t0) / 8 * 1e3

    def chain(body):
        @jax.jit
        def run(idx, vals):
            def step(acc, _):
                out = body(idx, vals + acc[:, :1, :1].astype(vals.dtype))
                return acc + out[:, :1, :1].astype(acc.dtype) * 0.0 + 1.0, \
                    jnp.sum(out.astype(jnp.float32))

            acc, sums = jax.lax.scan(
                step, jnp.zeros((B, 1, 1), jnp.float32), None, length=8
            )
            return jnp.sum(sums)

        return run

    # 1. plain at[].add (unsorted scatter-add)
    def scat_unsorted(idx, vals):
        z = jnp.zeros((B, HW, C), vals.dtype)
        return z.at[jnp.arange(B)[:, None], idx].add(vals)

    # 2. sorted scatter-add
    def scat_sorted(idx, vals):
        order = jnp.argsort(idx, axis=1)
        si = jnp.take_along_axis(idx, order, axis=1)
        sv = jnp.take_along_axis(vals, order[..., None], axis=1)
        z = jnp.zeros((B, HW, C), vals.dtype)
        return z.at[jnp.arange(B)[:, None], si].add(
            sv, indices_are_sorted=True
        )

    # 3. segment_sum per batch with sorted ids
    def seg_sorted(idx, vals):
        order = jnp.argsort(idx, axis=1)
        si = jnp.take_along_axis(idx, order, axis=1)
        sv = jnp.take_along_axis(vals, order[..., None], axis=1)

        def one(si_b, sv_b):
            return jax.ops.segment_sum(
                sv_b, si_b, num_segments=HW, indices_are_sorted=True
            )

        return jax.vmap(one)(si, sv)

    for name, fn in [
        ("scatter unsorted", scat_unsorted),
        ("scatter sorted", scat_sorted),
        ("segment_sum sorted", seg_sorted),
    ]:
        try:
            ms = timed(chain(fn), idx, vals)
            print(f"{name}: {ms:.2f} ms")
        except Exception as e:
            print(f"{name}: failed {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
