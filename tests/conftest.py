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


# The XLA:CPU backend segfaults inside backend_compile_and_load when one
# process accumulates the whole suite's compiled programs and then builds
# the large fused hostloop program (test_warm_duals, ~test 198): both
# suite halves pass in isolation, the concatenation crashes, solo/raised
# -stack/niced runs all reproduce (experiments/logs/r5_pytest4/5.log).
# Bound the per-process accumulation by dropping compiled executables
# between modules; cross-module cache reuse is minimal (each file builds
# its own configs), so the cost is seconds.
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
