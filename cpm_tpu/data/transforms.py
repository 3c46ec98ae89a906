"""Host-side image/box transforms (numpy + PIL).

Parity with /root/reference/pet/utils/data/transforms/transforms.py:11-111
and the fixed composition order in pet/rcnn/datasets/transform.py:37-45:
ColorJitter (off by default) -> Resize (shortest side to a randomly chosen
TRAIN.SCALES entry, capped by MAX_SIZE) -> RandomHorizontalFlip ->
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


def adjust_brightness(image: np.ndarray, factor: float) -> np.ndarray:
    """uint8 RGB brightness (torchvision 0.6 F.adjust_brightness =
    PIL ImageEnhance.Brightness, the reference's backend)."""
    from PIL import ImageEnhance

    pil = ImageEnhance.Brightness(Image.fromarray(image)).enhance(factor)
    return np.asarray(pil)


def adjust_contrast(image: np.ndarray, factor: float) -> np.ndarray:
    """uint8 RGB contrast (PIL ImageEnhance.Contrast: blend with the
    rounded mean of the L-converted image)."""
    from PIL import ImageEnhance

    pil = ImageEnhance.Contrast(Image.fromarray(image)).enhance(factor)
    return np.asarray(pil)


def adjust_saturation(image: np.ndarray, factor: float) -> np.ndarray:
    """uint8 RGB saturation (PIL ImageEnhance.Color: blend with L
    grayscale)."""
    from PIL import ImageEnhance

    pil = ImageEnhance.Color(Image.fromarray(image)).enhance(factor)
    return np.asarray(pil)


def adjust_hue(image: np.ndarray, factor: float) -> np.ndarray:
    """uint8 RGB hue shift by factor in [-0.5, 0.5] (torchvision 0.6
    F.adjust_hue: HSV roundtrip with uint8-wrapping H shift)."""
    if not -0.5 <= factor <= 0.5:
        raise ValueError(f"hue factor {factor} not in [-0.5, 0.5]")
    pil = Image.fromarray(image)
    h, s, v = pil.convert("HSV").split()
    np_h = np.asarray(h, dtype=np.uint8)
    # uint8 wraparound shift, matching torchvision's `np_h += uint8(...)`
    # (old-numpy modular float->uint8 cast: truncate toward zero, mod 256)
    shift = int(factor * 255) % 256
    np_h = (np_h.astype(np.int16) + shift).astype(np.uint8)
    h = Image.fromarray(np_h, "L")
    return np.asarray(Image.merge("HSV", (h, s, v)).convert("RGB"))


class ColorJitter:
    """Photometric jitter matching torchvision 0.6 ColorJitter, the
    backend of the reference's T.ColorJitter
    (/root/reference/pet/utils/data/transforms/transforms.py:78-93,
    driven by cfg.TRAIN.BRIGHTNESS/CONTRAST/SATURATION/HUE and composed
    FIRST, before Resize — pet/rcnn/datasets/transform.py:30-45).

    Scalar args b/c/s sample a factor uniformly from [max(0,1-v), 1+v];
    hue from [-v, v]. A 0.0 arg disables that op (torchvision's
    _check_input -> None). The enabled ops run in a random order.
    """

    _OPS = (
        ("brightness", adjust_brightness),
        ("contrast", adjust_contrast),
        ("saturation", adjust_saturation),
        ("hue", adjust_hue),
    )

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0,
                 hue=0.0):
        self.brightness = float(brightness)
        self.contrast = float(contrast)
        self.saturation = float(saturation)
        self.hue = float(hue)
        if not 0.0 <= self.hue <= 0.5:
            raise ValueError(f"TRAIN.HUE must be in [0, 0.5], got {hue}")
        self.enabled = any(
            getattr(self, name) > 0 for name, _ in self._OPS
        )

    def __call__(self, image: np.ndarray, rng: np.random.RandomState):
        if not self.enabled:
            return image
        ops = []
        for name, fn in self._OPS:
            v = getattr(self, name)
            if v <= 0:
                continue
            if name == "hue":
                factor = rng.uniform(-v, v)
            else:
                factor = rng.uniform(max(0.0, 1.0 - v), 1.0 + v)
            ops.append((fn, factor))
        for i in rng.permutation(len(ops)):
            fn, factor = ops[i]
            image = fn(image, factor)
        return image


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
        self.color_jitter = ColorJitter(
            cfg.TRAIN.BRIGHTNESS, cfg.TRAIN.CONTRAST,
            cfg.TRAIN.SATURATION, cfg.TRAIN.HUE,
        )
        self.pixel_means = tuple(cfg.PIXEL_MEANS)
        self.pixel_stds = tuple(cfg.PIXEL_STDS)
        self.to_bgr255 = bool(cfg.TO_BGR255)
        self.normalize = normalize

    def __call__(self, image, boxes, rng: np.random.RandomState):
        if self.color_jitter.enabled:
            image = self.color_jitter(image, rng)
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
