import numpy as np
import jax.numpy as jnp

from cpm_tpu.ops.box_coder import BoxCoder


def _np_encode(ref, prop, weights):
    """Reference encode (box_coder.py:22-50) in numpy."""
    ex_w = prop[:, 2] - prop[:, 0] + 1
    ex_h = prop[:, 3] - prop[:, 1] + 1
    ex_cx = prop[:, 0] + 0.5 * ex_w
    ex_cy = prop[:, 1] + 0.5 * ex_h
    gt_w = ref[:, 2] - ref[:, 0] + 1
    gt_h = ref[:, 3] - ref[:, 1] + 1
    gt_cx = ref[:, 0] + 0.5 * gt_w
    gt_cy = ref[:, 1] + 0.5 * gt_h
    wx, wy, ww, wh = weights
    return np.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * np.log(gt_w / ex_w),
            wh * np.log(gt_h / ex_h),
        ],
        axis=1,
    )


def test_encode_matches_reference(rng):
    prop = rng.rand(10, 4) * 100
    prop[:, 2:] += prop[:, :2] + 5
    gt = prop + rng.randn(10, 4) * 3
    w = (10.0, 10.0, 5.0, 5.0)
    coder = BoxCoder(w)
    got = np.asarray(coder.encode(jnp.asarray(gt), jnp.asarray(prop)))
    want = _np_encode(gt, prop, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decode_inverts_encode(rng):
    """decode(encode(gt, prop), prop) == gt up to the -1 x2/y2 convention."""
    prop = rng.rand(10, 4) * 100
    prop[:, 2:] += prop[:, :2] + 5
    gt = prop + rng.randn(10, 4) * 3
    coder = BoxCoder((10.0, 10.0, 5.0, 5.0))
    codes = coder.encode(jnp.asarray(gt), jnp.asarray(prop))
    dec = np.asarray(coder.decode(codes, jnp.asarray(prop)))
    # the decode "-1" on x2/y2 exactly cancels the TO_REMOVE=1 widths:
    # decode(encode(gt, p), p) == gt
    np.testing.assert_allclose(dec, gt, rtol=1e-4, atol=1e-3)


def test_decode_multiclass_columns(rng):
    prop = rng.rand(4, 4) * 100
    prop[:, 2:] += prop[:, :2] + 5
    codes = rng.randn(4, 12).astype(np.float32) * 0.1
    coder = BoxCoder((10.0, 10.0, 5.0, 5.0))
    dec = np.asarray(coder.decode(jnp.asarray(codes), jnp.asarray(prop)))
    assert dec.shape == (4, 12)
    # each 4-column block decodes like a standalone call
    one = np.asarray(coder.decode(jnp.asarray(codes[:, 4:8]), jnp.asarray(prop)))
    np.testing.assert_allclose(dec[:, 4:8], one, rtol=1e-5)


def test_box_coder_matches_reference_torch():
    """Encode/decode vs the reference's own BoxCoder
    (pet/rcnn/utils/box_coder.py, pure torch)."""
    import importlib
    import sys
    import types

    import pytest

    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    RBC = importlib.import_module("pet.rcnn.utils.box_coder")

    rng = np.random.RandomState(21)
    N = 64
    x1 = rng.rand(N) * 500
    y1 = rng.rand(N) * 400
    anchors = np.stack([
        x1, y1, x1 + 4 + rng.rand(N) * 120, y1 + 4 + rng.rand(N) * 90
    ], 1).astype(np.float32)
    gt = (anchors + (rng.rand(N, 4) - 0.5) * 40).astype(np.float32)
    gt[:, 2] = np.maximum(gt[:, 2], gt[:, 0] + 2)
    gt[:, 3] = np.maximum(gt[:, 3], gt[:, 1] + 2)

    weights = (10.0, 10.0, 5.0, 5.0)
    ref = RBC.BoxCoder(weights=weights)
    ours = BoxCoder(weights=weights)

    want_enc = ref.encode(
        torch.from_numpy(gt), torch.from_numpy(anchors)
    ).numpy()
    got_enc = np.asarray(ours.encode(jnp.asarray(gt), jnp.asarray(anchors)))
    np.testing.assert_allclose(got_enc, want_enc, rtol=1e-5, atol=1e-5)

    deltas = (rng.rand(N, 4).astype(np.float32) - 0.5) * 2
    want_dec = ref.decode(
        torch.from_numpy(deltas), torch.from_numpy(anchors)
    ).numpy()
    got_dec = np.asarray(
        ours.decode(jnp.asarray(deltas), jnp.asarray(anchors))
    )
    np.testing.assert_allclose(
        got_dec, want_dec.reshape(got_dec.shape), rtol=1e-4, atol=1e-3
    )
