import numpy as np
import pytest
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


def _np_box_voting_oracle(top, top_s, pool, pool_s, thresh, method, beta):
    """Straight transcription of csrc/Box_ops/box_voting.cu (no +1 IoU
    convention, devIoU:14-24; per-neighbor accumulators :88-131; final
    reduction :182-203)."""
    K, P = len(top), len(pool)
    out_boxes = np.zeros((K, 4))
    out_scores = np.array(top_s, np.float64)
    for i in range(K):
        sw = ss = bw = 0.0
        acc = np.zeros(4)
        for j in range(P):
            ax1, ay1, ax2, ay2 = top[i]
            bx1, by1, bx2, by2 = pool[j]
            iw = max(min(ax2, bx2) - max(ax1, bx1), 0.0)
            ih = max(min(ay2, by2) - max(ay1, by1), 0.0)
            inter = iw * ih
            iou = inter / (
                (ax2 - ax1) * (ay2 - ay1)
                + (bx2 - bx1) * (by2 - by1) - inter
            )
            if iou >= thresh:
                w = pool_s[j]
                acc += np.asarray(pool[j]) * w
                bw += w
                if method == "IOU_AVG":
                    sw += iou
                    ss += iou * w
                else:
                    sw += 1.0
                    if method in ("ID", "AVG", "QUASI_SUM"):
                        ss += w
                    elif method == "TEMP_AVG":
                        ss += (
                            1.0 / (1.0 + (1.0 / w - 1.0) ** (1.0 / beta))
                            if w != 0.0 else w
                        )
                    elif method == "GENERALIZED_AVG":
                        ss += w ** beta
        out_boxes[i] = acc / bw
        if method in ("TEMP_AVG", "AVG", "IOU_AVG"):
            out_scores[i] = ss / sw
        elif method == "GENERALIZED_AVG":
            out_scores[i] = (ss / sw) ** (1.0 / beta)
        elif method == "QUASI_SUM":
            out_scores[i] = ss / sw ** beta
    return out_boxes, out_scores


@pytest.mark.parametrize(
    "method", ["ID", "TEMP_AVG", "AVG", "IOU_AVG", "GENERALIZED_AVG",
               "QUASI_SUM"]
)
def test_box_voting_all_scoring_methods_vs_cuda_semantics(method):
    from cpm_tpu.ops.nms import box_voting

    rng = np.random.RandomState(42)
    P = 40
    xy = rng.uniform(0, 80, (P, 2))
    wh = rng.uniform(8, 40, (P, 2))
    pool = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    pool_s = rng.uniform(0.05, 1.0, P).astype(np.float32)
    top_idx = rng.choice(P, 8, replace=False)
    top, top_s = pool[top_idx], pool_s[top_idx]
    beta = 0.7
    want_b, want_s = _np_box_voting_oracle(
        top, top_s, pool, pool_s, 0.5, method, beta
    )
    got_b, got_s = box_voting(
        jnp.asarray(top), jnp.asarray(top_s), jnp.asarray(pool),
        jnp.asarray(pool_s), 0.5, scoring_method=method, beta=beta,
    )
    np.testing.assert_allclose(np.asarray(got_b), want_b, rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-5,
                               atol=1e-6)


def test_box_ml_voting_temp_avg_label_aware():
    from cpm_tpu.ops.nms import box_ml_voting

    rng = np.random.RandomState(7)
    P = 30
    xy = rng.uniform(0, 60, (P, 2))
    wh = rng.uniform(10, 30, (P, 2))
    pool = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    pool_s = rng.uniform(0.05, 1.0, P).astype(np.float32)
    pool_l = rng.randint(1, 4, P)
    top_idx = rng.choice(P, 6, replace=False)
    got_b, got_s = box_ml_voting(
        jnp.asarray(pool[top_idx]), jnp.asarray(pool_s[top_idx]),
        jnp.asarray(pool_l[top_idx]), jnp.asarray(pool),
        jnp.asarray(pool_s), jnp.asarray(pool_l), 0.5,
        scoring_method="TEMP_AVG", beta=0.7,
    )
    # per top box, restrict the pool to same-label and check against the
    # single-label oracle
    for r, i in enumerate(top_idx):
        keep = pool_l == pool_l[i]
        want_b, want_s = _np_box_voting_oracle(
            pool[i : i + 1], pool_s[i : i + 1], pool[keep], pool_s[keep],
            0.5, "TEMP_AVG", 0.7,
        )
        np.testing.assert_allclose(np.asarray(got_b[r]), want_b[0],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_s[r]), want_s[0],
                                   rtol=1e-5, atol=1e-6)
