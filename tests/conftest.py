"""Test harness: run JAX on a virtual 8-device CPU mesh.

This is the idiomatic JAX fake backend for exercising multi-chip sharding
without a real TPU slice (SURVEY.md section 4).  Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell exports axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# persistent compile cache makes repeated test runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
