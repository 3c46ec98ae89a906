import numpy as np
import jax.numpy as jnp

from cpm_tpu.ops.nms import multiclass_nms, nms, soft_nms


def _np_greedy_nms(boxes, scores, thresh):
    """Sequential greedy NMS with the reference kernels' standard IoU
    (no +1 — torchvision nms / ml_nms.cu:19-26)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            iou = inter / (a[i] + a[j] - inter)
            if iou > thresh:
                suppressed[j] = True
    return keep


def _rand_boxes(rng, n, size=100.0):
    b = rng.rand(n, 4) * size
    b[:, 2:] = b[:, :2] + rng.rand(n, 2) * size * 0.5 + 2
    return b.astype(np.float32)


def test_nms_matches_sequential(rng):
    for trial in range(5):
        n = 50
        boxes = _rand_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n)
        got = list(np.asarray(idx)[np.asarray(valid)])
        want = _np_greedy_nms(boxes, scores, 0.5)
        assert got == want


def test_nms_respects_mask(rng):
    boxes = _rand_boxes(rng, 20)
    scores = rng.rand(20).astype(np.float32)
    mask = np.zeros(20, bool)
    mask[:10] = True
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20, jnp.asarray(mask))
    got = set(np.asarray(idx)[np.asarray(valid)])
    want = set(_np_greedy_nms(boxes[:10], scores[:10], 0.5))
    assert got == want


def test_nms_max_output_truncates(rng):
    boxes = _rand_boxes(rng, 30, size=10000.0)  # spread out: no suppression
    scores = rng.rand(30).astype(np.float32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
    assert np.asarray(valid).sum() <= 5


def test_multiclass_nms_no_cross_class_suppression(rng):
    # identical boxes, different labels: both survive
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([1, 2], np.int32)
    idx, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), 0.5, 2
    )
    assert np.asarray(valid).sum() == 2
    # same label: one suppressed
    labels = np.array([1, 1], np.int32)
    idx, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), 0.5, 2
    )
    assert np.asarray(valid).sum() == 1


def test_soft_nms_linear_decay():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, new_scores, valid = soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 3, method="linear",
        overlap_thresh=0.3, score_thresh=0.001,
    )
    idx, new_scores, valid = map(np.asarray, (idx, new_scores, valid))
    assert idx[0] == 0 and abs(new_scores[0] - 0.9) < 1e-6
    # overlapping box decays: iou=1 -> score*(1-1)=0 -> below thresh
    assert idx[1] == 2  # far box picked next
    assert valid.sum() == 2


def test_nms_matches_reference_kernels(rng):
    """Cross-check against the ref_oracle stubs that drive the reference
    model (torchvision nms / ml_nms.cu semantics)."""
    import torch

    from tests.ref_oracle import ref_ml_nms, ref_nms

    for trial in range(5):
        n = 64
        boxes = _rand_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.55, n)
        got = list(np.asarray(idx)[np.asarray(valid)])
        want = ref_nms(
            torch.from_numpy(boxes), torch.from_numpy(scores), 0.55
        ).tolist()
        assert got == want

        labels = rng.randint(1, 5, n).astype(np.int64)
        idx, valid = multiclass_nms(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(labels.astype(np.int32)), 0.55, n,
        )
        got = list(np.asarray(idx)[np.asarray(valid)])
        want = ref_ml_nms(
            torch.from_numpy(boxes), torch.from_numpy(scores),
            torch.from_numpy(labels), 0.55,
        ).tolist()
        assert got == want
