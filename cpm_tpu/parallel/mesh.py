"""Device mesh + sharding helpers: TPU-native data parallelism.

Replaces the reference's NCCL DistributedDataParallel stack (SURVEY §2.13:
torch.distributed.launch + DDP gradient allreduce + DistributedSampler).
Here parallelism is a 1-D jax.sharding.Mesh over the 'data' axis: the
train step is jitted with the batch sharded on 'data' and params
replicated — XLA inserts the gradient all-reduce over ICI automatically
(the pjit equivalent of DDP, with the collective fused into the backward).

Multi-host: jax.distributed.initialize() + the same mesh over all devices
replaces the env:// rendezvous (train_net.py:37-44).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first num_devices devices.

    Raises if fewer than num_devices devices exist — silently truncating
    would mask a misconfigured multi-chip launch.
    """
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"make_mesh: asked for {num_devices} devices but the "
                f"backend has {len(devices)} "
                f"({[d.platform for d in devices[:4]]}...). For CPU-hosted "
                "multi-device tests set JAX_PLATFORMS=cpu and XLA_FLAGS="
                "--xla_force_host_platform_device_count=<n> before jax "
                "backend init."
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device_put each [B, ...] array with its leading dim sharded.

    Single-process: `batch` is the global batch, device_put splits it.
    Multi-process (jax.distributed): `batch` is this process's LOCAL
    slice (global_batch / process_count, the train CLI's local_batch);
    the shards are assembled into one global array per leaf — the JAX
    analogue of the reference's per-rank DistributedSampler slice
    (pet/utils/data/samplers/distributed.py:7-63)."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            global_shape = (
                x.shape[0] * jax.process_count(),
            ) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sh, x, global_shape
            )

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )
