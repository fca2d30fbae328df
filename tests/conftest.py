"""Test harness configuration.

All tests run on CPU with 8 virtual XLA devices (SURVEY §4: the reference has
no distributed tests; ours simulate a multi-chip mesh via
``--xla_force_host_platform_device_count``) and with x64 enabled so that
bit-exact parity against the float64 NumPy twins is meaningful.

NOTE: env vars must be set before the first JAX import, and the platform must
*also* be forced via ``jax.config`` — in this environment an ambient
``JAX_PLATFORMS=axon`` TPU-tunnel plugin would otherwise win.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
