"""Loss functions (pure jnp; XLA fuses these into surrounding compute).

Replaces the reference's python losses (pet/lib/ops/smooth_l1_loss.py:48,
l2_loss.py:11) and the CUDA SigmoidFocalLoss kernel
(pet/lib/ops/csrc/FocalLoss/SigmoidFocalLoss_cuda.cu) — on TPU a fused
elementwise expression is already speed-of-light, no custom kernel needed.

All losses take explicit validity masks (padded-slot aware) and normalize by
true counts, preserving the reference's variable-size normalization
semantics under fixed shapes.
"""

import jax
import jax.numpy as jnp


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    beta: float = 1.0 / 9,
    weights: jnp.ndarray | None = None,
    normalizer: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Huber loss, summed over elements (optionally weighted) / normalizer.

    Matches reference smooth_l1_loss (size_average=False path then divided
    by the caller's normalizer, e.g. rpn/loss.py:115-125).
    """
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if weights is not None:
        loss = loss * weights
    return jnp.sum(loss) / jnp.maximum(normalizer, 1.0)


def l2_loss(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """0.5 * (pred - target)^2 averaged over valid entries.

    Reference l2_loss (pet/lib/ops/l2_loss.py:11) — used by the ISM IoU
    branch (grid_cascade_rcnn/loss.py:273).
    """
    err = 0.5 * (pred - target) ** 2
    if mask is None:
        return jnp.mean(err)
    m = mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean CE over valid entries; labels are int class ids."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]
    if mask is None:
        return jnp.mean(nll)
    m = mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def binary_cross_entropy_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean BCE-with-logits over valid entries (grid heatmap loss)."""
    # numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    loss = (
        jnp.clip(logits, 0.0, None)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    if mask is None:
        return jnp.mean(loss)
    m = jnp.broadcast_to(mask, loss.shape).astype(loss.dtype)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """RetinaNet focal loss, summed.

    Matches the CUDA kernel semantics
    (csrc/FocalLoss/SigmoidFocalLoss_cuda.cu:17-56): logits cover classes
    1..num_classes-1 (no background column); labels==0 is background
    (contributes only the negative term), labels<0 are ignored.
    """
    # logits: [N, C-1]; class c column corresponds to label c+1
    n, cm1 = logits.shape
    class_ids = jnp.arange(1, num_classes)[None, :]  # [1, C-1]
    t = labels[:, None]  # [N, 1]
    p = jax.nn.sigmoid(logits)
    pos = (t == class_ids).astype(logits.dtype)
    neg = ((t != class_ids) & (t >= 0)).astype(logits.dtype)
    term_pos = jnp.power(1.0 - p, gamma) * jnp.log(jnp.clip(p, 1e-14))
    term_neg = jnp.power(p, gamma) * jnp.log(jnp.clip(1.0 - p, 1e-14))
    loss = -pos * term_pos * alpha - neg * term_neg * (1.0 - alpha)
    return jnp.sum(loss)


def iou_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    loss_type: str = "iou",
    legacy_plus1: bool = False,
) -> jnp.ndarray:
    """IoU / GIoU / linear-IoU losses over xyxy boxes (lib/ops/iou_loss.py)."""
    px1, py1, px2, py2 = (pred[..., i] for i in range(4))
    tx1, ty1, tx2, ty2 = (target[..., i] for i in range(4))
    off = 1.0 if legacy_plus1 else 0.0
    pa = (px2 - px1 + off) * (py2 - py1 + off)
    ta = (tx2 - tx1 + off) * (ty2 - ty1 + off)
    iw = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1) + off, 0.0)
    ih = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1) + off, 0.0)
    inter = iw * ih
    union = pa + ta - inter
    iou = inter / jnp.maximum(union, 1e-7)
    if loss_type == "iou":
        loss = -jnp.log(jnp.clip(iou, 1e-7))
    elif loss_type == "linear_iou":
        loss = 1.0 - iou
    elif loss_type == "giou":
        cw = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1) + off
        ch = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1) + off
        enclose = jnp.maximum(cw * ch, 1e-7)
        giou = iou - (enclose - union) / enclose
        loss = 1.0 - giou
    else:
        raise ValueError(loss_type)
    if mask is None:
        return jnp.mean(loss)
    m = mask.astype(loss.dtype)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)
