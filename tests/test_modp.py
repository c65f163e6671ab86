"""Property tests for the uint32-pair Goldilocks arithmetic vs Python ints.

Replicates the contract of tests/test_ModP.cu (GPU vs NTL oracle on random
inputs) for the TPU limb-pair implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuhe_tpu.ops import modp

P = modp.P
N = 1 << 16


def _rand_u64(rng, n, near_p=True):
    x = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    if near_p:
        # mix in adversarial values near P, 2^32 boundaries, 0
        special = np.array(
            [np.uint64(v) for v in
             (0, 1, 0xFFFFFFFF, 1 << 32, (1 << 32) + 1,
              P - 2, P - 1, P, P + 1, (1 << 64) - 1, (1 << 64) - 2,
              P + 2, 1 << 63)], dtype=np.uint64)
        x[: len(special)] = special
    return x


def _canon(rng, n):
    x = _rand_u64(rng, n).astype(object) % P
    return np.array(x.astype(np.uint64), dtype=np.uint64)


def test_add64_sub64_mul(rng):
    a = _rand_u64(rng, N)
    b = _rand_u64(rng, N)
    pa, pb = modp.pair_from_u64(a), modp.pair_from_u64(b)
    s, c = jax.jit(modp.add64)(pa, pb)
    got = modp.u64_from_pair(*s).astype(object) + (np.asarray(c).astype(object) << 64)
    want = a.astype(object) + b.astype(object)
    np.testing.assert_array_equal(got, want)

    d, bor = jax.jit(modp.sub64)(pa, pb)
    got = modp.u64_from_pair(*d).astype(object) - (np.asarray(bor).astype(object) << 64)
    want = a.astype(object) - b.astype(object)
    np.testing.assert_array_equal(got, want)

    w = jax.jit(modp.mul64)(pa, pb)
    got = sum(np.asarray(x).astype(object) << (32 * i) for i, x in enumerate(w))
    want = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(got, want)


def test_mul32(rng):
    a = rng.integers(0, 1 << 32, size=N, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=N, dtype=np.uint32)
    lo, hi = jax.jit(modp.mul32)(jnp.asarray(a), jnp.asarray(b))
    got = modp.u64_from_pair(lo, hi).astype(object)
    want = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(got, want)


def test_add_sub_modp(rng):
    a = _canon(rng, N)
    b = _canon(rng, N)
    pa, pb = modp.pair_from_u64(a), modp.pair_from_u64(b)
    s = jax.jit(modp.add_modp)(pa, pb)
    got = modp.u64_from_pair(*s).astype(object)
    want = (a.astype(object) + b.astype(object)) % P
    np.testing.assert_array_equal(got, want)

    d = jax.jit(modp.sub_modp)(pa, pb)
    got = modp.u64_from_pair(*d).astype(object)
    want = (a.astype(object) - b.astype(object)) % P
    np.testing.assert_array_equal(got, want)


def test_mul_modp_any_u64(rng):
    # mul_modp is specified for any inputs < 2^64 (not only canonical)
    a = _rand_u64(rng, N)
    b = _rand_u64(rng, N)
    pa, pb = modp.pair_from_u64(a), modp.pair_from_u64(b)
    r = jax.jit(modp.mul_modp)(pa, pb)
    got = modp.u64_from_pair(*r).astype(object)
    want = (a.astype(object) * b.astype(object)) % P
    np.testing.assert_array_equal(got, want)
    assert (got < P).all()


def test_reduce128(rng):
    ws = [rng.integers(0, 1 << 32, size=N, dtype=np.uint32) for _ in range(4)]
    r = jax.jit(modp.reduce128)(*[jnp.asarray(w) for w in ws])
    got = modp.u64_from_pair(*r).astype(object)
    want = sum(w.astype(object) << (32 * i) for i, w in enumerate(ws)) % P
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("pbits", [20, 25, 26, 31, 32])
def test_mod_u32(rng, pbits):
    from cuhe_tpu import hostmath as hm

    p = hm.prev_prime((1 << pbits) - 1)
    mu = modp.barrett_mu(p)
    x = _rand_u64(rng, N)
    px = modp.pair_from_u64(x)
    r = jax.jit(lambda v: modp.mod_u32(v, jnp.uint32(p), mu))(px)
    got = np.asarray(r).astype(object)
    want = x.astype(object) % p
    np.testing.assert_array_equal(got, want)


def test_mulmod_u32(rng):
    from cuhe_tpu import hostmath as hm

    p = hm.prev_prime((1 << 25) - 1)
    mu = modp.barrett_mu(p)
    a = rng.integers(0, 1 << 32, size=N, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=N, dtype=np.uint32)
    r = jax.jit(lambda x, y: modp.mulmod_u32(x, y, jnp.uint32(p), mu))(
        jnp.asarray(a), jnp.asarray(b))
    want = (a.astype(object) * b.astype(object)) % p
    np.testing.assert_array_equal(np.asarray(r).astype(object), want)


def test_combine_limb_sums(rng):
    # T_s < 2^27 as produced by the NTT limb matmuls
    nvals = 4096
    ts_np = [rng.integers(0, 1 << 27, size=nvals, dtype=np.int64).astype(np.int32)
             for _ in range(15)]
    r = jax.jit(modp.combine_limb_sums)([jnp.asarray(t) for t in ts_np])
    got = modp.u64_from_pair(*r).astype(object)
    want = sum(t.astype(object) << (8 * s) for s, t in enumerate(ts_np)) % P
    np.testing.assert_array_equal(got, want)


def test_limb_decomposition(rng):
    x = _rand_u64(rng, 4096)
    pa = modp.pair_from_u64(x)
    limbs = modp.pair_to_limbs8(pa)
    got = sum(np.asarray(l).astype(object) << (8 * i) for i, l in enumerate(limbs))
    np.testing.assert_array_equal(got, x.astype(object))
