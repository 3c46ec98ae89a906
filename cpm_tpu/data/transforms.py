"""Host-side image/box transforms (numpy + PIL).

Parity with /root/reference/pet/utils/data/transforms/transforms.py:11-111
and the fixed composition order in pet/rcnn/datasets/transform.py:37-45:
Resize (shortest side to a randomly chosen TRAIN.SCALES entry, capped by
MAX_SIZE) -> RandomHorizontalFlip -> ColorJitter (off by default) ->
ToTensor -> Normalize (RGB->BGR, x255, subtract caffe pixel means).

Box semantics preserve the reference's integer-coordinate conventions:
h-flip maps x -> W - x - 1 (bounding_box.py:128-166 TO_REMOVE=1).

Train resize uses PIL bilinear (the reference's torchvision F.resize path);
eval uses the same helper (the reference uses cv2 INTER_LINEAR at eval —
numerically close; documented deviation).
"""

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def get_resize_size(
    orig_hw: Tuple[int, int], shortest: int, max_size: int
) -> Tuple[int, int]:
    """Target (h, w): shortest side -> `shortest`, longest capped at
    max_size (transforms.py:29-52 get_size)."""
    h, w = orig_hw
    size = shortest
    if max_size is not None:
        min_orig = float(min(h, w))
        max_orig = float(max(h, w))
        if max_orig / min_orig * size > max_size:
            size = int(round(max_size * min_orig / max_orig))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return oh, ow


def resize_image_and_boxes(
    image: np.ndarray,
    boxes: np.ndarray,
    shortest: int,
    max_size: int,
):
    """Resize HWC uint8 image (PIL bilinear) + scale boxes. Returns
    (image, boxes, (new_h, new_w))."""
    h, w = image.shape[:2]
    nh, nw = get_resize_size((h, w), shortest, max_size)
    if (nh, nw) != (h, w):
        pil = Image.fromarray(image)
        pil = pil.resize((nw, nh), Image.BILINEAR)
        image = np.asarray(pil)
        ratio_w = nw / w
        ratio_h = nh / h
        boxes = boxes.copy()
        boxes[:, 0::2] *= ratio_w
        boxes[:, 1::2] *= ratio_h
    return image, boxes, (nh, nw)


def hflip_image_and_boxes(image: np.ndarray, boxes: np.ndarray):
    """Horizontal flip with TO_REMOVE=1 box math (bounding_box.py:145-152)."""
    w = image.shape[1]
    image = image[:, ::-1]
    out = boxes.copy()
    out[:, 0] = w - boxes[:, 2] - 1
    out[:, 2] = w - boxes[:, 0] - 1
    return np.ascontiguousarray(image), out


def normalize_image(
    image: np.ndarray,
    pixel_means: Sequence[float],
    pixel_stds: Sequence[float] = (1.0, 1.0, 1.0),
    to_bgr255: bool = True,
) -> np.ndarray:
    """uint8 RGB HWC -> float32 normalized (transforms.py:96-111).

    to_bgr255: channel-swap to BGR and keep the 0..255 range (caffe-style
    models), then (x - mean) / std.
    """
    img = image.astype(np.float32)
    if to_bgr255:
        img = img[:, :, ::-1]
    else:
        img = img / 255.0
    mean = np.asarray(pixel_means, np.float32)
    std = np.asarray(pixel_stds, np.float32)
    return (img - mean) / std


def to_model_channel_order(image: np.ndarray, to_bgr255: bool) -> np.ndarray:
    """uint8 RGB -> uint8 in the model's expected channel order (no
    normalization — the model applies the input affine on device)."""
    if to_bgr255:
        return np.ascontiguousarray(image[:, :, ::-1])
    return np.ascontiguousarray(image)


class TrainTransform:
    """Random-scale resize + random hflip + normalize (or, with
    normalize=False, uint8 output in model channel order for device-side
    normalization)."""

    def __init__(self, cfg, normalize: bool = True):
        self.scales = tuple(cfg.TRAIN.SCALES)
        self.max_size = cfg.TRAIN.MAX_SIZE
        self.flip_prob = 0.5  # RandomHorizontalFlip(0.5), transform.py:37-45
        self.pixel_means = tuple(cfg.PIXEL_MEANS)
        self.pixel_stds = tuple(cfg.PIXEL_STDS)
        self.to_bgr255 = bool(cfg.TO_BGR255)
        self.normalize = normalize

    def __call__(self, image, boxes, rng: np.random.RandomState):
        shortest = self.scales[rng.randint(len(self.scales))]
        image, boxes, size = resize_image_and_boxes(
            image, boxes, shortest, self.max_size
        )
        if rng.rand() < self.flip_prob:
            image, boxes = hflip_image_and_boxes(image, boxes)
        if self.normalize:
            image = normalize_image(
                image, self.pixel_means, self.pixel_stds, self.to_bgr255
            )
        else:
            image = to_model_channel_order(image, self.to_bgr255)
        return image, boxes, size


class TestTransform:
    """Fixed-scale resize + normalize. Returns the resize scale for
    mapping detections back to original coordinates."""

    def __init__(self, cfg, scale: Optional[int] = None,
                 max_size: Optional[int] = None, normalize: bool = True):
        self.scale = scale if scale is not None else cfg.TEST.SCALE
        self.max_size = max_size if max_size is not None else cfg.TEST.MAX_SIZE
        self.pixel_means = tuple(cfg.PIXEL_MEANS)
        self.pixel_stds = tuple(cfg.PIXEL_STDS)
        self.to_bgr255 = bool(cfg.TO_BGR255)
        self.normalize = normalize

    def __call__(self, image):
        h, w = image.shape[:2]
        dummy = np.zeros((0, 4), np.float32)
        image, _, (nh, nw) = resize_image_and_boxes(
            image, dummy, self.scale, self.max_size
        )
        if self.normalize:
            image = normalize_image(
                image, self.pixel_means, self.pixel_stds, self.to_bgr255
            )
        else:
            image = to_model_channel_order(image, self.to_bgr255)
        return image, (nh, nw), (nh / h, nw / w)
