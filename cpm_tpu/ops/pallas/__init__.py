"""Pallas TPU kernels for the hot ops.

Each kernel has a jnp reference implementation in cpm_tpu/ops (used for
autodiff and CPU tests); the Pallas versions are the TPU fast path.
"""
