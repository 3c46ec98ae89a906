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
    """Route this process's computation to ``local_devices[i % n]``.

    This is the SOFT half of eval-shard device separation: it only
    chooses where ops are placed, it does not partition the runtime's
    device set. On real TPU hosts the HARD half is
    ``TPU_VISIBLE_DEVICES=<chip>`` set in the child's environment by
    ``tools/test_net.py run_sharded`` (the analogue of the reference's
    per-subprocess ``CUDA_VISIBLE_DEVICES``,
    pet/utils/subprocess.py:30-40) — libtpu is exclusive-access per
    process, so concurrent children must not initialize the same chip.
    On CPU / virtual-device hosts this routing alone is sufficient.
    Returns the chosen device.
    """
    import jax

    devs = jax.local_devices()
    dev = devs[int(shard_index) % len(devs)]
    jax.config.update("jax_default_device", dev)
    return dev
