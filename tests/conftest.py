"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding paths (jax.sharding.Mesh over axes (batch, crt)) are exercised
without TPU pod hardware, mirroring how the reference's multi-GPU paths are
only testable with multiple GPUs present (SURVEY.md section 4).  Numerical
kernels are integer-exact, so CPU results match TPU results bit-for-bit;
TPU-side validation happens in bench.py which runs on the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# NOTE: under the axon TPU tunnel the JAX_PLATFORMS env var is ignored, so
# pin the platform through the config API (set CUHE_TEST_TPU=1 to run the
# numeric suite on the real chip instead).
if not os.environ.get("CUHE_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    # persistent compilation cache (TPU only: the XLA:CPU AOT cache can
    # deadlock on machine-feature mismatches)
    _cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)
