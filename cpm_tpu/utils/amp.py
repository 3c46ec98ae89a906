"""Mixed precision: bf16 compute with f32 master params.

TPU-native replacement for the reference's apex amp hooks
(pet/lib/ops/roi_align.py:14 `amp.float_function`): instead of per-op
casting rules, the train/eval step casts the float params and the image
batch to TPU.COMPUTE_DTYPE (bfloat16) before model.apply — every conv and
matmul then runs on the MXU in bf16 — while coordinate arithmetic (box
coder, NMS IoU, grid decode) and loss reductions locally upcast to f32.
Gradients flow through the cast, so the optimizer update and params stay
f32 (master weights).
"""

import jax
import jax.numpy as jnp


def cast_floating_to(tree, dtype):
    """Cast float leaves of a pytree to dtype; leave ints/bools alone."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def cast_images(images, dtype):
    """Cast an image batch to the compute dtype — EXCEPT uint8 batches,
    which stay uint8 so the model's device-side normalization
    (GeneralizedRCNN._normalize_uint8) sees them."""
    if images.dtype == jnp.uint8:
        return images
    return images.astype(dtype)


def compute_dtype(cfg):
    """Resolve TPU.COMPUTE_DTYPE ('bfloat16' | 'float32')."""
    name = getattr(getattr(cfg, "TPU", None), "COMPUTE_DTYPE", "float32")
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "f32"):
        return jnp.float32
    raise ValueError(f"unsupported TPU.COMPUTE_DTYPE: {name}")
