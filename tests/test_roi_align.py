import numpy as np
import jax
import jax.numpy as jnp

from cpm_tpu.ops.pooler import Pooler, assign_fpn_levels
from cpm_tpu.ops.roi_align import roi_align


def _np_roi_align(feat, rois, out_size, scale, sr, aligned=False):
    """Naive loop RoIAlign matching ROIAlign_cuda.cu bilinear semantics.

    feat: [H, W, C]; rois: [R, 4] xyxy (single image).
    """
    h, w, c = feat.shape
    ph, pw = out_size
    out = np.zeros((len(rois), ph, pw, c), np.float64)

    def interp(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx
        )

    off = 0.5 if aligned else 0.0
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / pw, rh / ph
        for py in range(ph):
            for px in range(pw):
                acc = np.zeros(c)
                for sy in range(sr):
                    for sx in range(sr):
                        yy = y1 + py * bh + (sy + 0.5) * bh / sr
                        xx = x1 + px * bw + (sx + 0.5) * bw / sr
                        acc += interp(yy, xx)
                out[r, py, px] = acc / (sr * sr)
    return out


def test_roi_align_matches_naive(rng):
    feat = rng.rand(1, 16, 16, 3).astype(np.float32)
    rois4 = np.array(
        [[2.0, 2.0, 30.0, 30.0], [0.0, 0.0, 10.0, 20.0], [5.0, 7.0, 9.0, 12.0]],
        np.float32,
    )
    rois = np.concatenate([np.zeros((3, 1), np.float32), rois4], axis=1)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), (7, 7), 0.5, 2)
    )
    want = _np_roi_align(feat[0], rois4, (7, 7), 0.5, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_aligned_mode(rng):
    feat = rng.rand(1, 12, 12, 2).astype(np.float32)
    rois4 = np.array([[1.0, 1.0, 8.0, 9.0]], np.float32)
    rois = np.concatenate([np.zeros((1, 1), np.float32), rois4], axis=1)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), (4, 4), 1.0, 2, aligned=True)
    )
    want = _np_roi_align(feat[0], rois4, (4, 4), 1.0, 2, aligned=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_batch_index(rng):
    feat = rng.rand(2, 8, 8, 2).astype(np.float32)
    roi = np.array([[1.0, 0.0, 0.0, 16.0, 16.0]], np.float32)  # image 1
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(roi), (4, 4), 0.5, 2))
    want = _np_roi_align(feat[1], roi[:, 1:], (4, 4), 0.5, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_grad_flows(rng):
    feat = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    rois = jnp.asarray([[0.0, 1.0, 1.0, 6.0, 6.0]], jnp.float32)

    def f(x):
        return jnp.sum(roi_align(x, rois, (2, 2), 1.0, 2))

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_fpn_level_assignment():
    # area 224^2 box -> canonical level 4
    b = jnp.asarray([[0.0, 0.0, 223.0, 223.0], [0.0, 0.0, 55.0, 55.0],
                     [0.0, 0.0, 1000.0, 1000.0]])
    lv = np.asarray(assign_fpn_levels(b, 2, 5))
    assert lv[0] == 4
    assert lv[1] == 2  # small box -> finest
    assert lv[2] == 5  # huge box -> coarsest


def test_fpn_level_assignment_degenerate_boxes():
    # x2 < x1 / y2 < y1 (grid decode on untrained heatmaps can emit
    # these): negative plus1-area must NOT become sqrt(neg) -> NaN ->
    # garbage int level — the pallas level switch and the gather path
    # resolve NaN-cast levels differently (0.84 output delta measured
    # on chip). Degenerate boxes pin to the finest level instead.
    b = jnp.asarray([
        [100.0, 100.0, 90.0, 140.0],   # x2 < x1
        [100.0, 100.0, 140.0, 80.0],   # y2 < y1
        [100.0, 100.0, 90.0, 80.0],    # both
    ])
    lv = np.asarray(assign_fpn_levels(b, 2, 5))
    assert (lv == 2).all(), lv


def test_pooler_level_selection(rng):
    feats = [
        jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32)),
        jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32)),
        jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32)),
        jnp.asarray(rng.rand(1, 4, 4, 4).astype(np.float32)),
    ]
    pooler = Pooler((7, 7), (0.25, 0.125, 0.0625, 0.03125), sampling_ratio=2)
    small = jnp.asarray([[0.0, 0.0, 0.0, 40.0, 40.0]])  # -> level 2
    out = pooler(feats, small)
    want = np.asarray(
        roi_align(feats[0], small, (7, 7), 0.25, 2)
    )
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)
    # masked roi yields zeros
    out = pooler(feats, small, roi_mask=jnp.asarray([False]))
    assert np.abs(np.asarray(out)).sum() == 0


def test_multilevel_roi_align_matches_per_level():
    """Flattened single-gather pooling == per-level RoIAlign + one-hot
    select (the Pooler's former formulation)."""
    import numpy as np
    import jax.numpy as jnp
    from cpm_tpu.ops.roi_align import multilevel_roi_align, roi_align

    rng = np.random.RandomState(3)
    B, C = 2, 16
    shapes = [(56, 80), (28, 40), (14, 20), (7, 10)]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    feats = [
        jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
        for h, w in shapes
    ]
    R = 64
    rois = np.zeros((R, 5), np.float32)
    rois[:, 0] = rng.randint(0, B, R)
    x1 = rng.rand(R) * 180
    y1 = rng.rand(R) * 120
    rois[:, 1], rois[:, 2] = x1, y1
    rois[:, 3] = x1 + rng.rand(R) * 140 + 4
    rois[:, 4] = y1 + rng.rand(R) * 100 + 4
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.randint(0, 4, R).astype(np.int32))

    got = multilevel_roi_align(feats, rois, levels, (7, 7), scales, 2)

    want = jnp.zeros_like(got)
    for i, (f, s) in enumerate(zip(feats, scales)):
        pooled = roi_align(f, rois, (7, 7), s, 2)
        sel = (levels == i).astype(pooled.dtype)
        want = want + pooled * sel[:, None, None, None]

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_pooler_force_f32_eval_precision():
    """TPU.EVAL_POOLER_DTYPE='float32': with the force flag set, pooling
    of bf16 features runs in f32 and casts back — identical values to an
    explicit f32 pooling of the same bf16 features."""
    import jax.numpy as jnp

    from cpm_tpu.ops import pooler as P

    rs = np.random.RandomState(0)
    feats_f32 = [
        jnp.asarray(rs.randn(1, 32 // s, 48 // s, 8).astype(np.float32))
        for s in (1, 2, 4, 8)
    ]
    feats_bf16 = [f.astype(jnp.bfloat16) for f in feats_f32]
    rois = jnp.asarray(
        np.array(
            [[0, 4.3, 5.1, 90.0, 60.0], [0, 10.0, 2.0, 200.0, 100.0]],
            np.float32,
        )
    )
    pool = P.Pooler((7, 7), (1 / 4, 1 / 8, 1 / 16, 1 / 32))
    with P.pooler_force_f32_scope(True):
        forced = pool(feats_bf16, rois)
    assert P._FORCE_F32.get() is False  # scope restored
    assert forced.dtype == jnp.bfloat16
    want = pool(
        [f.astype(jnp.float32) for f in feats_bf16], rois
    ).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(forced), np.asarray(want))
    # flag off: plain bf16 path unchanged
    plain = pool(feats_bf16, rois)
    assert plain.dtype == jnp.bfloat16
