"""Detectron-style box encode/decode with the reference's exact numerics.

Reference: /root/reference/pet/rcnn/utils/box_coder.py:6-94. Key quirks we
preserve: widths/heights use TO_REMOVE=1; decode subtracts 1 from x2/y2
("the -1 is correct"); dw/dh clamped at log(1000/16).

Shapes are broadcast-friendly: encode/decode accept [..., N, 4] boxes and
[..., N, 4*K] codes (K classes of box columns).
"""

import math

import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


class BoxCoder:
    def __init__(self, weights, bbox_xform_clip=BBOX_XFORM_CLIP):
        self.weights = tuple(float(w) for w in weights)
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, reference_boxes: jnp.ndarray, proposals: jnp.ndarray):
        """Regression targets mapping proposals -> reference (gt) boxes.

        Both [..., N, 4] xyxy; returns [..., N, 4].
        """
        to_remove = 1.0
        ex_w = proposals[..., 2] - proposals[..., 0] + to_remove
        ex_h = proposals[..., 3] - proposals[..., 1] + to_remove
        ex_cx = proposals[..., 0] + 0.5 * ex_w
        ex_cy = proposals[..., 1] + 0.5 * ex_h

        gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + to_remove
        gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + to_remove
        gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
        gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

        wx, wy, ww, wh = self.weights
        # guard against degenerate (padding) proposals: keep denominators
        # finite; padded slots are masked out downstream.
        ex_w = jnp.maximum(ex_w, 1e-6)
        ex_h = jnp.maximum(ex_h, 1e-6)
        gt_w = jnp.maximum(gt_w, 1e-6)
        gt_h = jnp.maximum(gt_h, 1e-6)

        dx = wx * (gt_cx - ex_cx) / ex_w
        dy = wy * (gt_cy - ex_cy) / ex_h
        dw = ww * jnp.log(gt_w / ex_w)
        dh = wh * jnp.log(gt_h / ex_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def decode(self, rel_codes: jnp.ndarray, boxes: jnp.ndarray):
        """Apply deltas to reference boxes.

        rel_codes: [..., N, 4*K]; boxes: [..., N, 4] -> [..., N, 4*K].
        """
        boxes = boxes.astype(rel_codes.dtype)
        to_remove = 1.0
        widths = boxes[..., 2] - boxes[..., 0] + to_remove
        heights = boxes[..., 3] - boxes[..., 1] + to_remove
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        dx = rel_codes[..., 0::4] / wx
        dy = rel_codes[..., 1::4] / wy
        dw = rel_codes[..., 2::4] / ww
        dh = rel_codes[..., 3::4] / wh

        dw = jnp.clip(dw, None, self.bbox_xform_clip)
        dh = jnp.clip(dh, None, self.bbox_xform_clip)

        pred_cx = dx * widths[..., None] + ctr_x[..., None]
        pred_cy = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        k = rel_codes.shape[-1] // 4
        out = jnp.stack(
            [
                pred_cx - 0.5 * pred_w,
                pred_cy - 0.5 * pred_h,
                pred_cx + 0.5 * pred_w - 1.0,  # -1 matches reference decode
                pred_cy + 0.5 * pred_h - 1.0,
            ],
            axis=-1,
        )  # [..., N, K, 4]
        return out.reshape(rel_codes.shape[:-1] + (4 * k,))
