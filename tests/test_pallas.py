"""Pallas kernel correctness (interpreter mode on CPU; compiled on TPU)."""

import jax
import numpy as np

from cuhe_tpu.ops import modp, pallas_kernels as pk

P = modp.P


def test_ntt_mul_pallas_matches_jnp(rng):
    shape = (3, 1024)
    a = rng.integers(0, P, size=shape, dtype=np.uint64)
    b = rng.integers(0, P, size=shape, dtype=np.uint64)
    pa, pb = modp.pair_from_u64(a), modp.pair_from_u64(b)
    interpret = jax.default_backend() != "tpu"
    lo, hi = pk.ntt_mul_pallas(pa[0], pa[1], pb[0], pb[1], interpret=interpret)
    got = modp.u64_from_pair(np.asarray(lo), np.asarray(hi)).astype(object)
    want = (a.astype(object) * b.astype(object)) % P
    np.testing.assert_array_equal(got, want)


def test_ntt_add_pallas_matches_jnp(rng):
    shape = (2, 1024)
    a = rng.integers(0, P, size=shape, dtype=np.uint64)
    b = rng.integers(0, P, size=shape, dtype=np.uint64)
    pa, pb = modp.pair_from_u64(a), modp.pair_from_u64(b)
    interpret = jax.default_backend() != "tpu"
    lo, hi = pk.ntt_add_pallas(pa[0], pa[1], pb[0], pb[1], interpret=interpret)
    got = modp.u64_from_pair(np.asarray(lo), np.asarray(hi)).astype(object)
    want = (a.astype(object) + b.astype(object)) % P
    np.testing.assert_array_equal(got, want)
