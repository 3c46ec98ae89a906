"""Fixed-shape box structures and pure-array box ops.

TPU-first replacement for the reference's ragged ``BoxList``
(/root/reference/pet/utils/data/structures/bounding_box.py:9) and its
``boxlist_ops``: boxes live in padded arrays ``[..., N, 4]`` with a validity
mask ``[..., N]`` so every op has a static shape and one XLA compilation
serves all images.

Numerics preserve the reference's integer-coordinate convention
(``TO_REMOVE = 1`` in areas/IoU, bounding_box.py:306, boxlist_ops.py:216)
via the ``legacy_plus1`` flag, default True, because the trained models'
mAP depends on it.

Box mode is always xyxy internally; xywh conversion exists only at the COCO
I/O boundary.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Boxes:
    """A padded, masked set of boxes plus named extra fields.

    Attributes:
      boxes: [..., N, 4] float array, xyxy.
      mask:  [..., N] bool validity array (False = padding slot).
      fields: dict of extra per-box arrays (scores, labels, regression
        targets, ...), each shaped [..., N, ...].
    """

    boxes: jnp.ndarray
    mask: jnp.ndarray
    fields: Dict[str, Any] = struct.field(default_factory=dict)

    @property
    def num_slots(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def with_fields(self, **kw) -> "Boxes":
        f = dict(self.fields)
        f.update(kw)
        return self.replace(fields=f)

    def field(self, name: str) -> jnp.ndarray:
        return self.fields[name]

    @classmethod
    def empty(cls, n: int, batch_shape=(), dtype=jnp.float32) -> "Boxes":
        return cls(
            boxes=jnp.zeros(batch_shape + (n, 4), dtype),
            mask=jnp.zeros(batch_shape + (n,), bool),
            fields={},
        )


def box_area(boxes: jnp.ndarray, legacy_plus1: bool = True) -> jnp.ndarray:
    """Area of xyxy boxes [..., 4] -> [...]. Reference bounding_box.py:306."""
    off = 1.0 if legacy_plus1 else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    return w * h


def box_iou(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    legacy_plus1: bool = True,
    mode: str = "iou",
    eps: float = 0.0,
) -> jnp.ndarray:
    """Pairwise IoU of [..., N, 4] x [..., M, 4] -> [..., N, M].

    Matches reference boxlist_iou (pet/lib/ops/boxlist_ops.py:186-224):
    intersection uses (rb - lt + TO_REMOVE).clamp(0).
    mode='iof' divides by area1 only.
    """
    off = 1.0 if legacy_plus1 else 0.0
    area1 = box_area(boxes1, legacy_plus1)  # [..., N]
    area2 = box_area(boxes2, legacy_plus1)  # [..., M]
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + off, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    if mode == "iou":
        denom = area1[..., :, None] + area2[..., None, :] - inter
    elif mode == "iof":
        denom = jnp.broadcast_to(area1[..., :, None], inter.shape)
    else:
        raise ValueError(mode)
    return inter / jnp.maximum(denom, jnp.finfo(inter.dtype).tiny + eps)


def clip_boxes_to_image(
    boxes: jnp.ndarray, image_size, legacy_plus1: bool = True
) -> jnp.ndarray:
    """Clip xyxy boxes to [0, W-1] x [0, H-1].

    image_size is (w, h) — either python ints or arrays broadcastable over
    the leading box dims. Reference bounding_box.py:294 (clip_to_image).
    """
    w, h = image_size
    off = 1.0 if legacy_plus1 else 0.0
    x1 = jnp.clip(boxes[..., 0], 0.0, w - off)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - off)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - off)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - off)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def remove_small_boxes_mask(
    boxes: jnp.ndarray, min_size: float, legacy_plus1: bool = True
) -> jnp.ndarray:
    """Validity mask for boxes with both sides >= min_size.

    Reference boxlist_ops.remove_small_boxes converts to xywh (w = x2-x1+1)
    and keeps w >= min_size & h >= min_size.
    """
    off = 1.0 if legacy_plus1 else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    return (w >= min_size) & (h >= min_size)


def nonempty_boxes_mask(boxes: jnp.ndarray) -> jnp.ndarray:
    """Mask of boxes with x2 > x1 and y2 > y1 (clip_to_image remove_empty)."""
    return (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])


def flip_boxes_horizontal(
    boxes: jnp.ndarray, image_width, legacy_plus1: bool = True
) -> jnp.ndarray:
    """Horizontal flip in xyxy. Reference bounding_box.py:128 (transpose).

    transposed_x1 = W - x2 - TO_REMOVE ; transposed_x2 = W - x1 - TO_REMOVE.
    """
    off = 1.0 if legacy_plus1 else 0.0
    x1 = image_width - boxes[..., 2] - off
    x2 = image_width - boxes[..., 0] - off
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def resize_boxes(boxes: jnp.ndarray, scale_xy) -> jnp.ndarray:
    """Scale boxes by per-axis ratios (sx, sy). bounding_box.py:91 (resize)."""
    sx, sy = scale_xy
    return boxes * jnp.stack(
        [jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sx), jnp.asarray(sy)],
        axis=-1,
    )


def convert_xywh_to_xyxy(
    boxes: jnp.ndarray, legacy_plus1: bool = True
) -> jnp.ndarray:
    """COCO xywh -> xyxy. x2 = x + max(w - TO_REMOVE, 0)."""
    off = 1.0 if legacy_plus1 else 0.0
    x, y, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [x, y, x + jnp.clip(w - off, 0.0, None), y + jnp.clip(h - off, 0.0, None)],
        axis=-1,
    )


def convert_xyxy_to_xywh(
    boxes: jnp.ndarray, legacy_plus1: bool = True
) -> jnp.ndarray:
    """xyxy -> COCO xywh. w = x2 - x1 + TO_REMOVE."""
    off = 1.0 if legacy_plus1 else 0.0
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack([x1, y1, x2 - x1 + off, y2 - y1 + off], axis=-1)


def pad_boxes_to(
    boxes: jnp.ndarray, n: int, mask: Optional[jnp.ndarray] = None
):
    """Pad/truncate a [M, 4] box array to [n, 4] + mask [n]. Host-side util."""
    m = boxes.shape[0]
    if mask is None:
        mask = jnp.ones((m,), bool)
    if m >= n:
        return boxes[:n], mask[:n]
    pad = [(0, n - m), (0, 0)]
    return (
        jnp.pad(boxes, pad),
        jnp.pad(mask, (0, n - m), constant_values=False),
    )


def concat_boxes(a: Boxes, b: Boxes) -> Boxes:
    """Concatenate two padded box sets along the slot axis (cat_boxlist)."""
    common = set(a.fields) & set(b.fields)
    return Boxes(
        boxes=jnp.concatenate([a.boxes, b.boxes], axis=-2),
        mask=jnp.concatenate([a.mask, b.mask], axis=-1),
        fields={
            k: jnp.concatenate([a.fields[k], b.fields[k]], axis=a.mask.ndim - 1)
            for k in common
        },
    )
