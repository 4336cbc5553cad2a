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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
