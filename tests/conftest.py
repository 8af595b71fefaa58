"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-host/sharding logic is tested with
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4d), the
standard JAX substitute for a real pod slice.

Note: the environment pre-imports jax with JAX_PLATFORMS pinned to the
remote TPU tunnel, so the platform must be overridden through jax.config
(env vars alone are read too early to help).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
