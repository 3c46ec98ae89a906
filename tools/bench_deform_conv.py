"""Microbench: deform_conv2d fwd / fwd+bwd at X-101-DCN stage geometries.

The flagship X-101-DCN config runs 30 deformable 3x3 convs (stages
res3/res4/res5, STAGE_WITH_CONV ('normal','deform','deform','deform')).
This isolates the op to attribute the train-step gap vs plain conv.

    python tools/bench_deform_conv.py [--impl gather]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--impl", default=None,
                    help="CPM_TPU_DEFORM_IMPL override")
    args = ap.parse_args()
    if args.impl:
        os.environ["CPM_TPU_DEFORM_IMPL"] = args.impl

    import jax
    import jax.numpy as jnp

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from cpm_tpu.ops.deform_conv import deform_conv2d

    B = args.batch
    # (name, H, W, Cin, Cout, n_blocks) — X-101-32x4d @ 832x1344:
    # deform sits on the 3x3 mid conv of each bottleneck
    stages = [
        ("res3", 104, 168, 256, 256, 4),
        ("res4", 52, 84, 512, 512, 23),
        ("res5", 26, 42, 1024, 1024, 3),
    ]
    rng = np.random.RandomState(0)
    total_fwd = total_train = 0.0
    for name, H, W, Cin, Cout, nblk in stages:
        x = jnp.asarray(
            rng.randn(B, H, W, Cin).astype(np.float32), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.01,
            jnp.bfloat16,
        )
        off = jnp.asarray(
            rng.randn(B, H, W, 18).astype(np.float32) * 2.0, jnp.bfloat16
        )

        # Chained timing with a single value readout: on tunneled PJRT
        # backends block_until_ready returns before the enqueued chain
        # executes (see bench.py), so each iteration feeds the next.
        @jax.jit
        def fwd_chain(x, w, o):
            def body(xc, _):
                r = deform_conv2d(xc, w, o)
                return xc + 0.001 * r.astype(xc.dtype), ()

            xc, _ = jax.lax.scan(body, x, None, length=10)
            return jnp.sum(xc.astype(jnp.float32))

        def loss(x, w, o):
            return jnp.sum(deform_conv2d(x, w, o).astype(jnp.float32))

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def train_chain(x, w, o):
            def body(xc, _):
                v, (gx, gw, go) = vg(xc, w, o)
                return xc + 0.001 * gx.astype(xc.dtype), v

            xc, vs = jax.lax.scan(body, x, None, length=10)
            return jnp.sum(xc.astype(jnp.float32)) + jnp.sum(vs)

        @jax.jit
        def conv_chain(x, w):
            def body(xc, _):
                r = jax.lax.conv_general_dilated(
                    xc, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return xc + 0.001 * r.astype(xc.dtype), ()

            xc, _ = jax.lax.scan(body, x, None, length=10)
            return jnp.sum(xc.astype(jnp.float32))

        def timed(fn, *a):
            float(fn(*a))  # warmup + compile
            t0 = time.time()
            float(fn(*a))
            return (time.time() - t0) / 10 * 1e3

        fwd_ms = timed(fwd_chain, x, w, off)
        train_ms = timed(train_chain, x, w, off)
        conv_ms = timed(conv_chain, x, w)

        print(
            f"{name}: fwd {fwd_ms:.2f} ms, fwd+bwd {train_ms:.2f} ms, "
            f"plain conv fwd {conv_ms:.2f} ms  (x{nblk} blocks -> "
            f"{train_ms * nblk:.0f} ms/step contribution)"
        )
        total_fwd += fwd_ms * nblk
        total_train += train_ms * nblk
    print(f"TOTAL estimated: fwd {total_fwd:.0f} ms, train {total_train:.0f} ms")


if __name__ == "__main__":
    main()
