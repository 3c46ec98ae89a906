"""Platform/env plumbing used by the CLIs and eval-shard children."""

import jax
import jax.numpy as jnp

from cpm_tpu.utils.platform_env import pin_default_device_for_shard


def test_pin_default_device_for_shard_spreads_over_devices():
    devs = jax.local_devices()
    assert len(devs) >= 2, "suite runs with 8 virtual devices"
    prev = jax.config.jax_default_device
    try:
        for i in (0, 3, len(devs) + 1):  # incl. wrap-around
            dev = pin_default_device_for_shard(i)
            assert dev == devs[i % len(devs)]
            x = jnp.ones((4,)) + 1
            assert list(x.devices()) == [dev]
    finally:
        jax.config.update("jax_default_device", prev)
