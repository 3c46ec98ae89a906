"""Upper-bound probe: shared-window DCN sampling.

One [Wd, Wd, C] window gather per OUTPUT PIXEL (P' = Ho*Wo indices,
9x fewer than per-sample) serves all 9 taps via tent weights that
vanish outside each tap's 2x2 support. EXACT only while every tap's
sample lands inside the window (|offset| <= (Wd-4)/2 roughly); this
probe ignores overflow to measure the formulation's ceiling.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def shared_window_dcn(x, w, off, Wd):
    import jax
    import jax.numpy as jnp

    B, H, W, C = x.shape
    kh = kw = 3
    K = 9
    # window anchored at output pixel - Wd//2 + 1 (covers taps -1..+1
    # plus offsets up to ~(Wd-4)/2)
    oy = jnp.arange(H, dtype=jnp.int32)
    ox = jnp.arange(W, dtype=jnp.int32)
    ay = jnp.clip(oy - Wd // 2 + 1, 0, max(H - Wd, 0))
    ax = jnp.clip(ox - Wd // 2 + 1, 0, max(W - Wd, 0))
    starts = jnp.stack(
        jnp.meshgrid(ay, ax, indexing="ij"), axis=-1
    ).reshape(1, H * W, 2)
    starts = jnp.broadcast_to(starts, (B, H * W, 2))
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    win = jax.lax.gather(
        x, starts, dnums, slice_sizes=(1, Wd, Wd, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B, HW, Wd, Wd, C]

    # sample coords per tap, relative to the window anchor
    base_y = oy[:, None].astype(jnp.float32) + jnp.array(
        [-1, 0, 1], jnp.float32
    )[None, :]  # [H, 3]
    base_x = ox[:, None].astype(jnp.float32) + jnp.array(
        [-1, 0, 1], jnp.float32
    )[None, :]
    offr = off.astype(jnp.float32).reshape(B, H, W, K, 2)
    ys = (base_y[None, :, None, :, None]
          + offr[..., 0].reshape(B, H, W, 3, 3)[..., :, :]
          ).reshape(B, H, W, 3, 3)
    xs = (base_x[None, None, :, None, :]
          + offr[..., 1].reshape(B, H, W, 3, 3))
    # relative to anchor
    rel_y = ys - ay[None, :, None, None, None].astype(jnp.float32)
    rel_x = xs - ax[None, None, :, None, None].astype(jnp.float32)
    cells = jnp.arange(Wd, dtype=jnp.float32)
    # tent weights [B, H, W, 3, 3, Wd]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y[..., None] - cells))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x[..., None] - cells))
    wy = wy.astype(x.dtype).reshape(B, H * W, K, Wd)
    wx = wx.astype(x.dtype).reshape(B, H * W, K, Wd)
    # sampled[b,p,k,c] = sum_uv win[b,p,u,v,c] wy[b,p,k,u] wx[b,p,k,v]
    t = jnp.einsum("bpuvc,bpku->bpkvc", win, wy)
    sampled = jnp.einsum("bpkvc,bpkv->bpkc", t, wx)
    cols = sampled.reshape(B, H, W, K * C)
    w2 = w.reshape(K * C, -1)
    return jnp.einsum(
        "bhwk,kc->bhwc", cols, w2, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--wd", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    B = 2
    stages = [
        ("res3", 104, 168, 256, 256),
        ("res4", 52, 84, 512, 512),
    ]
    rs = np.random.RandomState(0)
    for name, H, W, Cin, Cout in stages:
        x = jnp.asarray(
            rs.randn(B, H, W, Cin).astype(np.float32), jnp.bfloat16
        )
        w = jnp.asarray(
            rs.randn(3, 3, Cin, Cout).astype(np.float32) * 0.01,
            jnp.bfloat16,
        )
        off = jnp.asarray(
            rs.randn(B, H, W, 18).astype(np.float32), jnp.bfloat16
        )

        @jax.jit
        def fwd_chain(x, w, o):
            def body(xc, _):
                r = shared_window_dcn(xc, w, o, args.wd)
                return xc + 0.001 * r.astype(xc.dtype), ()

            xc, _ = jax.lax.scan(body, x, None, length=10)
            return jnp.sum(xc.astype(jnp.float32))

        def loss(x, w, o):
            return jnp.sum(
                shared_window_dcn(x, w, o, args.wd).astype(jnp.float32)
            )

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def train_chain(x, w, o):
            def body(xc, _):
                v, (gx, gw, go) = vg(xc, w, o)
                return xc + 0.001 * gx.astype(xc.dtype), v

            xc, vs = jax.lax.scan(body, x, None, length=10)
            return jnp.sum(xc.astype(jnp.float32)) + jnp.sum(vs)

        def timed(fn, *a):
            float(fn(*a))
            t0 = time.time()
            float(fn(*a))
            return (time.time() - t0) / 10 * 1e3

        # correctness vs the production sampler on small offsets
        from cpm_tpu.ops.deform_conv import deform_conv2d

        ref = deform_conv2d(x, w, off)
        got = shared_window_dcn(x, w, off, args.wd)
        err = float(
            jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max()
        )
        fwd_ms = timed(fwd_chain, x, w, off)
        train_ms = timed(train_chain, x, w, off)
        print(
            f"{name} Wd={args.wd}: fwd {fwd_ms:.2f} ms, "
            f"fwd+bwd {train_ms:.2f} ms, max|err| vs exact {err:.3e}"
        )


if __name__ == "__main__":
    main()
