import numpy as np
import jax.numpy as jnp

from cpm_tpu.structures.boxes import (
    box_area,
    box_iou,
    clip_boxes_to_image,
    convert_xywh_to_xyxy,
    convert_xyxy_to_xywh,
    flip_boxes_horizontal,
    remove_small_boxes_mask,
)


def _np_iou_plus1(b1, b2):
    """Naive reference IoU with TO_REMOVE=1 (boxlist_ops.py:186-224)."""
    n, m = len(b1), len(b2)
    out = np.zeros((n, m))
    a1 = (b1[:, 2] - b1[:, 0] + 1) * (b1[:, 3] - b1[:, 1] + 1)
    a2 = (b2[:, 2] - b2[:, 0] + 1) * (b2[:, 3] - b2[:, 1] + 1)
    for i in range(n):
        for j in range(m):
            lt = np.maximum(b1[i, :2], b2[j, :2])
            rb = np.minimum(b1[i, 2:], b2[j, 2:])
            wh = np.clip(rb - lt + 1, 0, None)
            inter = wh[0] * wh[1]
            out[i, j] = inter / (a1[i] + a2[j] - inter)
    return out


def test_iou_matches_naive(rng):
    b1 = rng.rand(7, 4) * 100
    b1[:, 2:] += b1[:, :2]
    b2 = rng.rand(5, 4) * 100
    b2[:, 2:] += b2[:, :2]
    got = np.asarray(box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = _np_iou_plus1(b1, b2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_area_plus1():
    b = jnp.asarray([[0.0, 0.0, 9.0, 4.0]])
    assert float(box_area(b)[0]) == 10.0 * 5.0
    assert float(box_area(b, legacy_plus1=False)[0]) == 9.0 * 4.0


def test_clip():
    b = jnp.asarray([[-5.0, -5.0, 200.0, 90.0]])
    out = np.asarray(clip_boxes_to_image(b, (100, 80)))
    np.testing.assert_allclose(out, [[0, 0, 99, 79]])


def test_flip_involution(rng):
    b = rng.rand(6, 4) * 50
    b[:, 2:] += b[:, :2]
    w = 128
    flipped = flip_boxes_horizontal(jnp.asarray(b), w)
    back = flip_boxes_horizontal(flipped, w)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-5, atol=1e-5)


def test_xywh_roundtrip(rng):
    b = rng.rand(6, 4) * 50
    b[:, 2:] += b[:, :2] + 1
    x = convert_xyxy_to_xywh(jnp.asarray(b))
    back = convert_xywh_to_xyxy(x)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-5, atol=1e-5)


def test_remove_small():
    b = jnp.asarray([[0, 0, 1, 1], [0, 0, 10, 10]], jnp.float32)
    m = np.asarray(remove_small_boxes_mask(b, min_size=5.0))
    assert list(m) == [False, True]


def test_box_iou_matches_reference_boxlist_iou():
    """box_iou (legacy +1 convention) vs the reference's boxlist_iou
    (pet/utils/data/structures/boxlist_ops.py, pure torch)."""
    import importlib
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    from ref_oracle import install_reference_stubs

    install_reference_stubs()
    BO = importlib.import_module("pet.utils.data.structures.boxlist_ops")
    BB = importlib.import_module("pet.utils.data.structures.bounding_box")

    rng = np.random.RandomState(29)
    M, N = 13, 57
    def rand_boxes(n):
        x1 = rng.rand(n) * 300
        y1 = rng.rand(n) * 200
        return np.stack([
            x1, y1, x1 + rng.rand(n) * 120, y1 + rng.rand(n) * 90
        ], 1).astype(np.float32)
    a, b = rand_boxes(M), rand_boxes(N)
    bla = BB.BoxList(torch.from_numpy(a), (400, 300), mode="xyxy")
    blb = BB.BoxList(torch.from_numpy(b), (400, 300), mode="xyxy")
    want = BO.boxlist_iou(bla, blb).numpy()
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b),
                             legacy_plus1=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
