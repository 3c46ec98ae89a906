"""Modeling layer: backbones, necks, RPN, RoI heads, model builder.

Flax/linen modules in NHWC layout (TPU-native). Mirrors the capability
surface of /root/reference/pet/rcnn/modeling/ but with fixed-shape,
jit-compatible forward passes throughout.
"""

from cpm_tpu.modeling import registry  # noqa: F401
