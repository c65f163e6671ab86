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


def test_intt_modcrt_pallas_matches_xla(rng):
    import jax.numpy as jnp

    from cuhe_tpu import hostmath as hm
    from cuhe_tpu.ops import ntt

    n = 16384
    p = hm.prev_prime((1 << 25) - 1)
    mu = modp.barrett_mu(p)
    x = rng.integers(0, p, size=(3, n // 2), dtype=np.uint32)
    X = ntt.ntt_fwd_u32(jnp.asarray(x), n)
    want = np.asarray(ntt.intt_modcrt(
        X, n, jnp.uint32(p), (jnp.uint32(mu[0]), jnp.uint32(mu[1]))))
    interpret = jax.default_backend() != "tpu"
    got = np.asarray(pk.intt_modcrt_pallas(
        X, n, jnp.full((3,), p, jnp.uint32),
        (jnp.full((3,), mu[0], jnp.uint32), jnp.full((3,), mu[1], jnp.uint32)),
        interpret=interpret))
    np.testing.assert_array_equal(got, want)
