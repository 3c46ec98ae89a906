"""Padded image batches — the TPU replacement for the reference's ImageList.

The reference pads a python list of CHW tensors up to a common size rounded
to SIZE_DIVISIBILITY (pet/utils/data/structures/image_list.py:26-69). Here
the batch is a single fixed-shape NHWC array (channels-last for TPU conv
layouts) with per-image true sizes carried alongside, padded on the host to
one of a small set of bucket shapes so XLA compiles once per bucket.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ImageBatch:
    """A batch of padded images.

    Attributes:
      images: [B, H, W, C] float array (NHWC; padded with zeros).
      sizes:  [B, 2] int array of true (height, width) per image.
    """

    images: jnp.ndarray
    sizes: jnp.ndarray

    @property
    def padded_hw(self) -> Tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to_divisibility(
    images, divisibility: int = 32, target_hw: Tuple[int, int] | None = None
) -> ImageBatch:
    """Host-side: pad a list of HWC numpy images to a common NHWC batch.

    If target_hw is given (a bucket shape), pad to exactly that; otherwise
    to the max size rounded up to `divisibility` (image_list.py:51-58).
    """
    sizes = np.array([im.shape[:2] for im in images], dtype=np.int32)
    if target_hw is None:
        h = round_up(int(sizes[:, 0].max()), divisibility)
        w = round_up(int(sizes[:, 1].max()), divisibility)
    else:
        h, w = target_hw
    c = images[0].shape[2]
    out = np.zeros((len(images), h, w, c), dtype=np.float32)
    for i, im in enumerate(images):
        out[i, : im.shape[0], : im.shape[1]] = im
    return ImageBatch(images=jnp.asarray(out), sizes=jnp.asarray(sizes))
