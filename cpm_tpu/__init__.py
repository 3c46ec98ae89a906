"""CPM-R-CNN TPU: a TPU-native (JAX/XLA/Pallas) object-detection framework.

A from-scratch rebuild of the capabilities of zhubinQAQ/CPM-R-CNN (WACV 2021,
"CPM R-CNN: Calibrating Point-guided Misalignment in Object Detection"),
designed TPU-first: fixed-shape padded tensors instead of ragged box lists,
device-resident label assignment, Pallas kernels for RoIAlign, and pjit/mesh
data parallelism instead of NCCL DDP.
"""

__version__ = "0.1.0"
