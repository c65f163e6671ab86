"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding paths (jax.sharding.Mesh over axes (batch, crt)) are exercised
without TPU pod hardware, mirroring how the reference's multi-GPU paths are
only testable with multiple GPUs present (SURVEY.md section 4).  Numerical
kernels are integer-exact, so CPU results match TPU results bit-for-bit;
TPU-side validation happens in bench.py which runs on the real chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)
