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

# Persistent XLA compile cache: the 8-device CPU-mesh tests pay ~1-2 min
# compiles whose graphs rarely change between runs; caching them holds the
# suite's wall time down (VERDICT r4 task 5). Local-only dir (gitignored).
#
# min_compile_time is 30 s, NOT ~0: serializing one of the video-predictor
# differential's mid-size executables abort()s inside XLA:CPU AOT export
# (C++ `Fatal Python error: Aborted` in compilation_cache.put_executable...,
# reproduced twice at the same test with a fresh cache dir). The heavy
# CPU-mesh train graphs this cache exists for compile in 100-475 s and still
# serialize fine; everything under 30 s recompiles per run and never hits
# the aborting writer.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".pytest_xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
