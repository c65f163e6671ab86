"""NTT correctness vs the reference oracle conventions.

Replicates tests/test_ntt.cu: forward transform of random uint32 inputs with
zero-padded upper half is checked against the naive DFT
out[k] = sum_{j<n/2} x[j] * w^(jk) mod P with w = g^(65536/n),
g = 15893793146607301539 (test_ntt.cu:38-64) — here at a random subset of
output indices (Python big-int oracle), plus inverse round-trips and the
exact-convolution property the whole library rests on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuhe_tpu import hostmath as hm
from cuhe_tpu.ops import modp, ntt

P = hm.P


def _oracle_dft(x: np.ndarray, n: int, ks: np.ndarray) -> np.ndarray:
    om = pow(hm.NTT_GEN, 65536 // n, P)
    pw = ntt._pow_table(om, n).astype(object)
    xo = x.astype(object)
    j = np.arange(len(x), dtype=np.int64)
    out = []
    for k in ks:
        out.append(int((xo * pw[(j * int(k)) % n]).sum()) % P)
    return np.array(out, dtype=object)


@pytest.mark.parametrize("n", [16384, 32768, 65536])
def test_forward_vs_dft_oracle(rng, n):
    x = rng.integers(0, 1 << 31, size=n // 2, dtype=np.uint32)
    lo, hi = jax.jit(lambda v: ntt.ntt_fwd_u32(v, n), static_argnums=())(
        jnp.asarray(x))
    got = modp.u64_from_pair(lo, hi).astype(object)
    ks = np.concatenate([np.arange(4), rng.integers(0, n, size=28)])
    want = _oracle_dft(x, n, ks)
    np.testing.assert_array_equal(got[ks], want)
    assert (got < P).all()


def test_inverse_scale_constants():
    # the INTT epilogue constants hard-coded in Base.cu:489,656,841
    assert hm.modinv(16384, P) == 18445618169508003841
    assert hm.modinv(32768, P) == 18446181119461294081
    assert hm.modinv(65536, P) == 18446462594437939201


@pytest.mark.parametrize("n", [16384])
def test_roundtrip_modcrt(rng, n):
    p = hm.prev_prime((1 << 25) - 1)
    mu_lo, mu_hi = modp.barrett_mu(p)
    x = rng.integers(0, p, size=n // 2, dtype=np.uint32)
    X = ntt.ntt_fwd_u32(jnp.asarray(x), n)
    y = ntt.intt_modcrt(X, n, jnp.uint32(p), (jnp.uint32(mu_lo), jnp.uint32(mu_hi)))
    y = np.asarray(y)
    np.testing.assert_array_equal(y[: n // 2], x)
    assert not y[n // 2:].any()


def test_exact_convolution(rng):
    """intt(ntt(a) . ntt(b)) mod p == integer convolution mod p."""
    n = 16384
    p = hm.prev_prime((1 << 25) - 1)
    mu = tuple(map(jnp.uint32, modp.barrett_mu(p)))
    a = rng.integers(0, p, size=n // 2, dtype=np.uint32)
    b = rng.integers(0, p, size=n // 2, dtype=np.uint32)
    A = ntt.ntt_fwd_u32(jnp.asarray(a), n)
    B = ntt.ntt_fwd_u32(jnp.asarray(b), n)
    C = modp.mul_modp(A, B)
    c = np.asarray(ntt.intt_modcrt(C, n, jnp.uint32(p), mu))
    # oracle convolution via big-int packing (base 2^64; coeffs < n*p^2 < P)
    ia = int.from_bytes(b"".join(int(v).to_bytes(8, "little") for v in a), "little")
    ib = int.from_bytes(b"".join(int(v).to_bytes(8, "little") for v in b), "little")
    prod = ia * ib
    pb = prod.to_bytes(n * 8, "little")
    conv = np.array([int.from_bytes(pb[8 * i: 8 * i + 8], "little") % p
                     for i in range(n)], dtype=np.uint64)
    np.testing.assert_array_equal(c.astype(np.uint64), conv)


def test_digit_extraction(rng):
    w32 = 5
    n = 16384
    raw_ints = [int(rng.integers(0, 1 << 63)) * int(rng.integers(0, 1 << 63))
                % (1 << (32 * w32)) for _ in range(n // 2)]
    raw = jnp.asarray(hm.ints_to_words(raw_ints, w32))
    for w, wid in [(1, 0), (1, 137), (16, 3), (16, 9), (32, 2), (7, 11)]:
        got = np.asarray(ntt.extract_digit(raw, w, wid, w32))
        want = np.array([(c >> (w * wid)) & ((1 << w) - 1) for c in raw_ints],
                        dtype=np.uint64)
        np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_batched_matches_single(rng):
    n = 16384
    x = rng.integers(0, 1 << 31, size=(5, n // 2), dtype=np.uint32)
    lo1, hi1 = ntt.ntt_fwd_u32(jnp.asarray(x), n)
    lo2, hi2 = ntt.ntt_fwd_batched(jnp.asarray(x), n, chunk=2)
    np.testing.assert_array_equal(np.asarray(lo1), np.asarray(lo2))
    np.testing.assert_array_equal(np.asarray(hi1), np.asarray(hi2))


def test_i8_and_bf16_matmul_paths_bit_identical(rng):
    """The banded int8-MXU path (CUHE_NTT_I8=1, default) and the bf16
    limb-product path produce identical bits, incl. adversarial inputs."""
    import os

    n = 16384
    xs = [rng.integers(0, 1 << 32, size=(2, n // 2), dtype=np.uint32),
          np.full((2, n // 2), 0xFFFFFFFF, dtype=np.uint32)]
    v = rng.integers(0, (1 << 64) - (1 << 32) + 1, size=(1, n),
                     dtype=np.uint64)
    pair = (jnp.asarray((v & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((v >> 32).astype(np.uint32)))
    prev = os.environ.get("CUHE_NTT_I8")
    try:
        outs = {}
        for flag in ("0", "1"):
            os.environ["CUHE_NTT_I8"] = flag
            outs[flag] = ([np.asarray(a) for x in xs
                           for a in ntt.ntt_fwd_u32(jnp.asarray(x), n)]
                          + [np.asarray(a) for a in ntt.intt_raw(pair, n)])
        for a, b in zip(outs["0"], outs["1"]):
            np.testing.assert_array_equal(a, b)
    finally:
        if prev is None:
            os.environ.pop("CUHE_NTT_I8", None)
        else:
            os.environ["CUHE_NTT_I8"] = prev
