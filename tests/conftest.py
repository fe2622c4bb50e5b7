"""Test harness: run JAX on a virtual 8-device CPU mesh.

This is the idiomatic JAX fake backend for exercising multi-chip sharding
without a real TPU slice (SURVEY.md section 4).

NOTE: this environment's sitecustomize registers the axon (TPU) PJRT plugin
and imports jax at interpreter start, so setting JAX_PLATFORMS via os.environ
here is too late.  ``jax.config.update`` before the first backend use is the
reliable way to force CPU; XLA_FLAGS is still honored at backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache makes repeated test runs fast
# persistent cache incl. sub-second entries and custom_partitioning graphs
# (whose default cache key embeds a per-process pointer and never hits);
# rationale + measurements in eeg2video_tpu/utils/cache.py
from eeg2video_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache("/tmp/jax_cache")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected the virtual 8-device CPU mesh"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
