"""Test configuration: force CPU with a virtual 8-device mesh (multi-chip
sharding tests run on host platform devices) and enable x64 so accuracy
oracles compare against float64 scipy references.

Note: this image's sitecustomize force-registers the `axon` TPU backend and
sets jax_platforms="axon,cpu" *at interpreter start*, so the JAX_PLATFORMS
env var alone is not enough - we must override the config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
