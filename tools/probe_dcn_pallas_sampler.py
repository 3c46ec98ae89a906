"""Pallas per-sample DCN sampler prototype: measure, don't estimate.

docs/PROFILE.md's eleventh pass adopted a windowed `lax.gather` forward
for deformable-conv sampling and ESTIMATED (~40 cycles/sample) that a
Pallas per-sample formulation would land at or above the XLA per-index
floor measured by tools/probe_dcn_scatter.py. This probe replaces the
estimate with an on-chip number: a real Pallas kernel that, per sample,
DMAs a 2-row x 16-col x C window from HBM into a VMEM ring
(double-buffered across 64-sample sub-chunks) and reduces it with the
bilinear tent weights on the VPU.

Geometry: the X-101-32x4d-DCN deform-stage conv2 inputs at the 832x1344
bucket — res3 [104x168]xC256, res4 [52x84]xC512, res5 [26x42]xC1024 —
batch 2, K=9 taps.

Correctness: checked against ops.deform_conv._bilinear_gather on every
geometry. Timing: forward sampling only, vs the production
windowed-gather and the corner4 gather.

Run on the chip: python tools/probe_dcn_pallas_sampler.py
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XWIN = 16   # fetched cols: 8-aligned origin covers floor(x)+1 for any x
SUB = 64    # samples per DMA sub-chunk (one scratch slot)
BLOCK = 1024  # samples per grid step = SUB * 16 (SMEM tile (8, 128))


def _kernel(sub, b_ref, sy_ref, sx_ref, wy_ref, wx_ref, feat_ref, out_ref,
            win, sem):
    """One grid step = BLOCK samples. Index arrays arrive as (8, 128)
    SMEM blocks (whole-array scalar prefetch would exceed SMEM at DCN
    geometry). Sub-chunks of SUB samples ping-pong two VMEM window
    slots: chunk c+1's per-sample window DMAs are in flight while chunk
    c reduces on the VPU ([T,1] weight-column slices; no rank-expanding
    reshapes)."""
    n_chunks = BLOCK // sub

    def dma(slot, g0, g):
        sx = pl.multiple_of(sx_ref[g // 128, g % 128], 8)
        return pltpu.make_async_copy(
            feat_ref.at[
                b_ref[g // 128, g % 128],
                pl.ds(sy_ref[g // 128, g % 128], 2),
                pl.ds(sx, XWIN), :,
            ],
            win.at[slot, g0],
            sem.at[slot, g0],
        )

    def issue(c):
        slot = c % 2
        for g0 in range(sub):
            dma(slot, g0, c * sub + g0).start()

    def wait(c):
        slot = c % 2
        for g0 in range(sub):
            dma(slot, g0, c * sub + g0).wait()

    issue(0)
    for c in range(n_chunks):
        if c + 1 < n_chunks:
            issue(c + 1)
        wait(c)
        slot = c % 2
        C = out_ref.shape[1]
        acc = jnp.zeros((sub, C), jnp.float32)
        lo = c * sub
        for i in range(2):
            wyi = wy_ref[lo : lo + sub, i : i + 1].astype(jnp.float32)
            for k in range(XWIN):
                wk = wx_ref[lo : lo + sub, k : k + 1].astype(jnp.float32)
                cell = win[slot, :, i, k, :].astype(jnp.float32)
                acc = acc + cell * (wyi * wk)
        out_ref[lo : lo + sub, :] = acc.astype(out_ref.dtype)


def pallas_sample(feat, b_idx, sy, sx, wy, wx16):
    """feat [B,H,W,C] with W padded so every 8-aligned origin fits a
    full XWIN window; b/sy/sx int32 [N]; wy [N,2]; wx16 [N,XWIN].
    Returns [N, C] bilinear samples. N must be a multiple of BLOCK."""
    N = b_idx.shape[0]
    assert N % BLOCK == 0, (N, BLOCK)
    C = feat.shape[-1]
    sub = SUB if C < 1024 else 32  # VMEM ring budget at wide channels
    smem_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_kernel, sub),
        grid=(N // BLOCK,),
        in_specs=[
            smem_spec,                                        # b_idx
            smem_spec,                                        # sy
            smem_spec,                                        # sx
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0)),       # wy
            pl.BlockSpec((BLOCK, XWIN), lambda i: (i, 0)),    # wx16
            pl.BlockSpec(memory_space=pl.ANY),                # feat (HBM)
        ],
        out_specs=pl.BlockSpec((BLOCK, C), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, sub, 2, XWIN, C), feat.dtype),
            pltpu.SemaphoreType.DMA((2, sub)),
        ],
        out_shape=jax.ShapeDtypeStruct((N, C), feat.dtype),
    )(
        b_idx.reshape(N // 128, 128), sy.reshape(N // 128, 128),
        sx.reshape(N // 128, 128), wy, wx16, feat,
    )


def prepare(feat_shape, ys, xs):
    """Window starts + tent weights with _window_parts clamp semantics."""
    B, H, W, C = feat_shape
    sy = np.clip(np.floor(ys), 0, max(H - 2, 0)).astype(np.int32)
    sxf = np.clip(np.floor(xs), 0, max(W - 2, 0)).astype(np.int32)
    # 8-aligned origin, NO right-clamp: the caller pads feat's W so the
    # full XWIN window is always in the padded buffer (an unaligned
    # origin breaks the multiple_of(8) DMA promise -> garbage reads)
    sx = ((sxf // 8) * 8).astype(np.int32)
    ii = np.arange(2, dtype=np.float32)
    ry = sy[:, None] + ii
    wy = np.maximum(0.0, 1.0 - np.abs(ys[:, None] - ry)) * (
        ry <= H - 1
    )
    kk = np.arange(XWIN, dtype=np.float32)
    rx = sx[:, None] + kk
    wx = np.maximum(0.0, 1.0 - np.abs(xs[:, None] - rx)) * (
        rx <= W - 1
    )
    return sy, sx, wy.astype(np.float32), wx.astype(np.float32)


def run_geometry(name, B, H, W, C, K=9, dtype=jnp.bfloat16, iters=20):
    from cpm_tpu.ops.deform_conv import (
        _bilinear_gather,
        _bilinear_gather_corner4,
    )

    rng = np.random.RandomState(0)
    P = H * W * K
    feat = jnp.asarray(
        rng.randn(B, H, W, C).astype(np.float32), dtype=dtype
    )
    # realistic DCN coords: anywhere in (padded) range incl. borders
    ys = rng.uniform(-1.5, H + 0.5, (B, P)).astype(np.float32)
    xs = rng.uniform(-1.5, W + 0.5, (B, P)).astype(np.float32)

    # flatten batch for the pallas path
    N0 = B * P
    N = (N0 + BLOCK - 1) // BLOCK * BLOCK
    b_idx = np.repeat(np.arange(B, dtype=np.int32), P)
    ys_f = ys.reshape(-1)
    xs_f = xs.reshape(-1)
    pad = N - N0
    if pad:
        b_idx = np.concatenate([b_idx, np.zeros(pad, np.int32)])
        ys_f = np.concatenate([ys_f, np.zeros(pad, np.float32)])
        xs_f = np.concatenate([xs_f, np.zeros(pad, np.float32)])
    sy, sx, wy, wx = prepare(feat.shape, ys_f, xs_f)
    # pad W so any 8-aligned origin <= ((W-2)//8)*8 has a full window
    Wp = ((W - 2) // 8) * 8 + XWIN
    feat_p = jnp.pad(feat, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))

    f_pallas = jax.jit(pallas_sample)
    f_win = jax.jit(_bilinear_gather)
    f_c4 = jax.jit(_bilinear_gather_corner4)

    args_p = (
        feat_p, jnp.asarray(b_idx), jnp.asarray(sy), jnp.asarray(sx),
        jnp.asarray(wy), jnp.asarray(wx),
    )
    args_g = (feat, jnp.asarray(ys), jnp.asarray(xs))

    out_p = np.asarray(f_pallas(*args_p))[:N0].reshape(B, P, C)
    out_w = np.asarray(f_win(*args_g))
    d = np.abs(
        out_p.astype(np.float32) - np.asarray(out_w).astype(np.float32)
    ).max()
    tol = 0.15 if dtype == jnp.bfloat16 else 1e-4
    status = "OK" if d < tol else "MISMATCH"
    print(f"{name}: correctness max|d|={d:.4f} [{status}]")

    def clock(f, args):
        r = f(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(iters):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.time() - t0) / iters * 1e3

    tp = clock(f_pallas, args_p)
    tw = clock(f_win, args_g)
    tc = clock(f_c4, args_g)
    n_samples = B * P
    print(
        f"{name}: pallas {tp:.2f} ms | windowed-gather {tw:.2f} ms | "
        f"corner4 {tc:.2f} ms  ({n_samples} samples; pallas "
        f"{tp * 1e6 / n_samples:.0f} ns/sample)"
    )
    return dict(geometry=name, pallas_ms=tp, windowed_ms=tw,
                corner4_ms=tc, samples=n_samples, max_diff=float(d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"devices: {jax.devices()}")
    res = []
    # X-101-32x4d deform-stage conv2 geometries at the 832x1344 bucket:
    # channels = D*cardinality (resnext.py width rule) = 256/512/1024
    for name, H, W, C in [
        ("res3 104x168xC256", 104, 168, 256),
        ("res4 52x84xC512", 52, 84, 512),
        ("res5 26x42xC1024", 26, 42, 1024),
    ]:
        res.append(run_geometry(name, 2, H, W, C, dtype=dt))
    import json

    print(json.dumps(res))


if __name__ == "__main__":
    main()
