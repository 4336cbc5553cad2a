"""Test harness config: force JAX onto CPU with 8 virtual devices.

This emulates an 8-chip TPU pod on a single host (the analog of the
reference's gloo-on-CPU fallback, dist_util.py:35-38) so multi-device
sharding tests run anywhere. Must execute before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: UNet compiles dominate test wall-clock on
# CPU; cache them across runs.
import jax  # noqa: E402

# The environment presets JAX_PLATFORMS=axon and pre-imports jax via
# PYTHONPATH sitecustomize, so the env vars above can be too late — force
# the platform through the config API, which always wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
