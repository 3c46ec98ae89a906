"""Fixed-shape NMS family for TPU.

Replaces the reference CUDA/C++ kernels (csrc/NMS/ml_nms.cu, soft_nms.cpp,
torchvision nms used at pet/lib/ops/nms.py:10-11) and boxlist wrappers
(pet/lib/ops/boxlist_ops.py:34-178). TPU-native design: no dynamic shapes —
every function takes padded [N] arrays with a validity mask and returns
fixed-size outputs with a validity mask.

Hard NMS uses sort + a fixed-point "self-suppression" iteration: keep[i] is
recomputed as "no kept higher-scored box overlaps me" until convergence,
which yields exactly the sequential greedy NMS result (the iteration count
equals the longest suppression chain, typically << N).

IoU convention: the reference's NMS-family kernels all use the STANDARD
(x2-x1)*(y2-y1) IoU with no +1 — torchvision nms (RPN), ml_nms.cu:19-26,
soft_nms.cpp:22,72, box_voting.cu — while its matcher/boxlist_iou path
uses TO_REMOVE=1. Hence `legacy_plus1=False` defaults here (flipping it
was worth 4/50 differing RPN proposals vs the reference on identical
inputs: neighbor-anchor pairs whose +1-IoU crosses the 0.7 threshold).
"""

import jax
import jax.numpy as jnp

from cpm_tpu.structures.boxes import box_area, box_iou


def _sorted_keep_mask(iou: jnp.ndarray, valid: jnp.ndarray, thresh: float):
    """Greedy-NMS keep mask for boxes already sorted by descending score.

    iou: [N, N]; valid: [N] bool. Returns keep: [N] bool.
    """
    n = iou.shape[-1]
    row = jnp.arange(n)
    earlier = row[:, None] < row[None, :]  # j strictly before i (higher score)
    over = (iou > thresh) & earlier & valid[:, None] & valid[None, :]

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    def body(state):
        keep, _ = state
        new_keep = (~jnp.any(over & keep[:, None], axis=0)) & valid
        return new_keep, keep

    init = (valid, jnp.zeros_like(valid))
    keep, _ = jax.lax.while_loop(cond, body, init)
    return keep


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    mask: jnp.ndarray | None = None,
    legacy_plus1: bool = False,
):
    """Class-agnostic hard NMS.

    Args:
      boxes: [N, 4] xyxy; scores: [N]; mask: [N] validity (None = all valid).
      max_output: static output size.

    Returns:
      (indices [max_output] int32 into the input arrays,
       keep [max_output] bool validity)
    Kept boxes appear in descending score order.
    """
    n = boxes.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    neg_inf = jnp.finfo(scores.dtype).min
    s = jnp.where(mask, scores, neg_inf)
    order = jnp.argsort(-s)
    b_sorted = boxes[order]
    valid_sorted = mask[order]
    iou = box_iou(b_sorted, b_sorted, legacy_plus1=legacy_plus1)
    keep_sorted = _sorted_keep_mask(iou, valid_sorted, iou_threshold)

    # compact kept entries to the front, fixed size
    kept_rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
    slot = jnp.where(keep_sorted, kept_rank, max_output)  # overflow -> dropped
    out_idx = jnp.full((max_output + 1,), 0, jnp.int32)
    out_valid = jnp.zeros((max_output + 1,), bool)
    out_idx = out_idx.at[slot].set(order.astype(jnp.int32), mode="drop")
    out_valid = out_valid.at[slot].set(keep_sorted, mode="drop")
    return out_idx[:max_output], out_valid[:max_output]


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    mask: jnp.ndarray | None = None,
    legacy_plus1: bool = False,
):
    """Category-aware NMS via the coordinate-offset trick.

    Matches boxlist_nms batching (pet/lib/ops/boxlist_ops.py:34-38): boxes of
    different `idxs` (class or image id) never suppress each other.
    """
    max_coord = jnp.max(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_threshold, max_output, mask, legacy_plus1)


def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    mask: jnp.ndarray | None = None,
    legacy_plus1: bool = False,
):
    """ml_nms equivalent (csrc/NMS/ml_nms.cu): label-aware hard NMS."""
    return batched_nms(
        boxes, scores, labels, iou_threshold, max_output, mask, legacy_plus1
    )


def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output: int,
    sigma: float = 0.5,
    overlap_thresh: float = 0.3,
    score_thresh: float = 0.001,
    method: str = "linear",
    mask: jnp.ndarray | None = None,
    legacy_plus1: bool = False,
):
    """Soft-NMS (csrc/NMS/soft_nms.cpp semantics).

    Sequentially picks the max-scoring remaining box, then decays the scores
    of overlapping boxes (linear / gaussian / hard). Returns
    (indices [max_output], new_scores [max_output], valid [max_output]).
    """
    n = boxes.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    neg_inf = jnp.finfo(scores.dtype).min
    live_scores = jnp.where(mask, scores, neg_inf)
    iou = box_iou(boxes, boxes, legacy_plus1=legacy_plus1)

    def step(carry, _):
        s = carry
        i = jnp.argmax(s)
        si = s[i]
        ok = si > score_thresh
        ov = iou[i]
        if method == "linear":
            decay = jnp.where(ov > overlap_thresh, 1.0 - ov, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(ov * ov) / sigma)
        elif method == "hard":
            decay = jnp.where(ov > overlap_thresh, 0.0, 1.0)
        else:
            raise ValueError(method)
        s_new = jnp.where(s > neg_inf / 2, s * decay, s)
        s_new = s_new.at[i].set(neg_inf)  # picked box leaves the pool
        s_new = jnp.where(ok, s_new, s)
        return s_new, (i.astype(jnp.int32), si, ok)

    _, (idx, out_scores, valid) = jax.lax.scan(
        step, live_scores, None, length=max_output
    )
    valid = valid & (out_scores > score_thresh)
    return idx, out_scores, valid


def _temp_scores(pool_scores: jnp.ndarray, beta: float) -> jnp.ndarray:
    """TEMP_AVG's per-neighbor score transform (box_voting.cu:105-112):
    s -> 1 / (1 + (1/s - 1)^(1/beta)), i.e. sigmoid(logit(s) / beta) —
    temperature-scaled in logit space — with s == 0 passed through
    unchanged (the kernel's explicit weight != 0 guard). The voted score
    is then the plain mean of these transformed neighbor scores
    (box_voting.cu:192-194)."""
    s = jnp.clip(pool_scores, 0.0, 1.0)  # powf of a negative base is nan
    base = jnp.where(s > 0.0, 1.0 / jnp.where(s > 0.0, s, 1.0) - 1.0, 0.0)
    t = 1.0 / (1.0 + base ** (1.0 / beta))
    return jnp.where(s > 0.0, t, pool_scores)


def box_voting(
    top_boxes: jnp.ndarray,
    top_scores: jnp.ndarray,
    pool_boxes: jnp.ndarray,
    pool_scores: jnp.ndarray,
    thresh: float,
    scoring_method: str = "ID",
    beta: float = 1.0,
    top_mask: jnp.ndarray | None = None,
    pool_mask: jnp.ndarray | None = None,
    legacy_plus1: bool = False,
):
    """Box voting (csrc/Box_ops/box_voting.cu): refine kept boxes by the
    score-weighted average of all pre-NMS boxes overlapping >= thresh.

    Returns (voted_boxes [K, 4], voted_scores [K]).
    """
    if top_mask is None:
        top_mask = jnp.ones(top_boxes.shape[:1], bool)
    if pool_mask is None:
        pool_mask = jnp.ones(pool_boxes.shape[:1], bool)
    iou = box_iou(top_boxes, pool_boxes, legacy_plus1=legacy_plus1)  # [K, P]
    w = (iou >= thresh) & top_mask[:, None] & pool_mask[None, :]
    wf = w.astype(top_boxes.dtype) * jnp.clip(pool_scores, 0.0)[None, :]
    wsum = jnp.maximum(jnp.sum(wf, axis=1, keepdims=True), 1e-12)
    voted = (wf @ pool_boxes) / wsum

    nvote = jnp.maximum(jnp.sum(w, axis=1), 1)
    if scoring_method == "ID":
        scores = top_scores
    elif scoring_method == "TEMP_AVG":
        scores = (
            jnp.sum(jnp.where(w, _temp_scores(pool_scores, beta)[None, :],
                              0.0), axis=1) / nvote
        )
    elif scoring_method == "AVG":
        scores = jnp.sum(jnp.where(w, pool_scores[None, :], 0.0), axis=1) / nvote
    elif scoring_method == "IOU_AVG":
        wi = jnp.where(w, iou, 0.0)
        scores = jnp.sum(wi * pool_scores[None, :], axis=1) / jnp.maximum(
            jnp.sum(wi, axis=1), 1e-12
        )
    elif scoring_method == "GENERALIZED_AVG":
        p = jnp.where(w, jnp.clip(pool_scores, 1e-12)[None, :] ** beta, 0.0)
        scores = (jnp.sum(p, axis=1) / nvote) ** (1.0 / beta)
    elif scoring_method == "QUASI_SUM":
        scores = jnp.sum(jnp.where(w, pool_scores[None, :], 0.0), axis=1) / (
            nvote.astype(top_boxes.dtype) ** beta
        )
    else:
        raise ValueError(scoring_method)
    return voted, scores


def matrix_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    method: str = "gauss",
    sigma: float = 0.5,
    legacy_plus1: bool = False,
):
    """Matrix NMS (SOLOv2-style; reference boxlist_ops.matrix_nms:380).

    Returns decayed scores (no box removal; caller thresholds).
    """
    n = boxes.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    iou = box_iou(boxes, boxes, legacy_plus1=legacy_plus1)
    same = labels[:, None] == labels[None, :]
    higher = scores[:, None] >= scores[None, :]  # row j suppresses col i
    valid_pair = mask[:, None] & mask[None, :] & same & higher
    # strict: exclude self
    valid_pair = valid_pair & ~jnp.eye(n, dtype=bool)
    decay_iou = jnp.where(valid_pair, iou, 0.0)  # [j, i]
    comp_iou = jnp.max(decay_iou, axis=0)  # worst overlap from a suppressor
    if method == "gauss":
        decay = jnp.min(
            jnp.where(
                valid_pair,
                jnp.exp(-(decay_iou**2 - comp_iou[None, :] ** 2) / sigma),
                1.0,
            ),
            axis=0,
        )
    else:  # linear
        decay = jnp.min(
            jnp.where(
                valid_pair,
                (1.0 - decay_iou) / jnp.maximum(1.0 - comp_iou[None, :], 1e-12),
                1.0,
            ),
            axis=0,
        )
    return jnp.where(mask, scores * decay, scores)


def ml_soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    max_output: int,
    sigma: float = 0.5,
    overlap_thresh: float = 0.3,
    score_thresh: float = 0.001,
    method: str = "linear",
    mask: jnp.ndarray | None = None,
    legacy_plus1: bool = False,
):
    """Label-aware soft-NMS (csrc/NMS/ml_soft_nms.cpp) via the
    coordinate-offset trick: boxes of different labels never decay each
    other."""
    if mask is None:
        mask = jnp.ones(boxes.shape[:1], bool)
    max_coord = jnp.max(jnp.where(mask[:, None], boxes, 0.0)) + 1.0
    shifted = boxes + (labels.astype(boxes.dtype) * max_coord)[:, None]
    return soft_nms(
        shifted, scores, max_output, sigma, overlap_thresh, score_thresh,
        method, mask, legacy_plus1,
    )


def box_ml_voting(
    top_boxes: jnp.ndarray,
    top_scores: jnp.ndarray,
    top_labels: jnp.ndarray,
    pool_boxes: jnp.ndarray,
    pool_scores: jnp.ndarray,
    pool_labels: jnp.ndarray,
    thresh: float,
    scoring_method: str = "ID",
    beta: float = 1.0,
    top_mask: jnp.ndarray | None = None,
    pool_mask: jnp.ndarray | None = None,
    legacy_plus1: bool = False,
):
    """Label-aware box voting (csrc/Box_ops/box_ml_voting.cu): only
    same-label pool boxes vote."""
    if top_mask is None:
        top_mask = jnp.ones(top_boxes.shape[:1], bool)
    if pool_mask is None:
        pool_mask = jnp.ones(pool_boxes.shape[:1], bool)
    same = top_labels[:, None] == pool_labels[None, :]
    return _box_ml_voting_impl(
        top_boxes, top_scores, pool_boxes, pool_scores, same, thresh,
        scoring_method, beta, top_mask, pool_mask, legacy_plus1,
    )


def _box_ml_voting_impl(
    top_boxes, top_scores, pool_boxes, pool_scores, same, thresh,
    scoring_method, beta, top_mask, pool_mask, legacy_plus1,
):
    iou = box_iou(top_boxes, pool_boxes, legacy_plus1=legacy_plus1)
    w = (iou >= thresh) & top_mask[:, None] & pool_mask[None, :] & same
    wf = w.astype(top_boxes.dtype) * jnp.clip(pool_scores, 0.0)[None, :]
    wsum = jnp.maximum(jnp.sum(wf, axis=1, keepdims=True), 1e-12)
    voted = (wf @ pool_boxes) / wsum
    nvote = jnp.maximum(jnp.sum(w, axis=1), 1)
    if scoring_method == "ID":
        scores = top_scores
    elif scoring_method == "TEMP_AVG":
        scores = (
            jnp.sum(jnp.where(w, _temp_scores(pool_scores, beta)[None, :],
                              0.0), axis=1) / nvote
        )
    elif scoring_method == "AVG":
        scores = jnp.sum(jnp.where(w, pool_scores[None, :], 0.0), axis=1) / nvote
    elif scoring_method == "IOU_AVG":
        wi = jnp.where(w, iou, 0.0)
        scores = jnp.sum(wi * pool_scores[None, :], axis=1) / jnp.maximum(
            jnp.sum(wi, axis=1), 1e-12
        )
    elif scoring_method == "GENERALIZED_AVG":
        p = jnp.where(w, jnp.clip(pool_scores, 1e-12)[None, :] ** beta, 0.0)
        scores = (jnp.sum(p, axis=1) / nvote) ** (1.0 / beta)
    elif scoring_method == "QUASI_SUM":
        scores = jnp.sum(jnp.where(w, pool_scores[None, :], 0.0), axis=1) / (
            nvote.astype(top_boxes.dtype) ** beta
        )
    else:
        raise ValueError(scoring_method)
    return voted, scores
