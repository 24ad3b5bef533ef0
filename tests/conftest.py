"""Test harness config: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin in this environment ignores the ``JAX_PLATFORMS`` env var,
so we force the CPU backend through ``jax.config`` before any computation runs
(the standard JAX fake-backend trick for testing multi-chip sharding without a
pod).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
