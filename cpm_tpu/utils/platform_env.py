"""Re-assert the JAX_PLATFORMS env contract.

Some managed images pre-import jax from sitecustomize and set the
``jax_platforms`` CONFIG value while registering their PJRT plugin.
The config value outranks the ``JAX_PLATFORMS`` environment variable,
so a subprocess launched with ``JAX_PLATFORMS=cpu`` silently runs on
the accelerator anyway — sharded-eval children and CI subprocesses end
up contending for (and numerically diverging on) the device.

Calling :func:`honor_jax_platforms_env` before the first backend touch
restores the documented env-var behavior. On a stock JAX install the
config already mirrors the env var and this is a no-op.
"""

import os


def honor_jax_platforms_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    if (jax.config.jax_platforms or "") != plats:
        jax.config.update("jax_platforms", plats)


def pin_default_device_for_shard(shard_index: int) -> "object":
    """Bind this process's default device to one local chip.

    The reference pins one GPU per eval-shard subprocess via
    ``CUDA_VISIBLE_DEVICES`` (pet/utils/subprocess.py:30-40). The TPU
    analogue: shard i computes on ``local_devices[i % n]`` so N
    children spread over all chips of the host instead of all queueing
    on device 0. Returns the chosen device.
    """
    import jax

    devs = jax.local_devices()
    dev = devs[int(shard_index) % len(devs)]
    jax.config.update("jax_default_device", dev)
    return dev
