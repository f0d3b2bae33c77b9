"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-device behaviour (the DP/TP sharding layer) is tested the JAX-native
way — ``xla_force_host_platform_device_count`` — so no TPU pod is needed
(SURVEY.md §4). Environment must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize imports jax and registers the axon TPU
# plugin before conftest runs, so JAX_PLATFORMS in os.environ is too late —
# but backends initialize lazily, so the config update below still wins.
jax.config.update("jax_platforms", "cpu")

# CPU XLA's default matmul path trades precision for speed (~1e-2 rel error
# in f32 einsums); parity tests compare against float64 numpy at 1e-4, so
# pin full precision for the test session. Production code keeps the fast
# default (bf16-accumulated MXU matmuls on TPU).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
