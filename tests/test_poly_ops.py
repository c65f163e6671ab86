"""End-to-end tests of domain conversions, Barrett polymul, and modswitch
against host big-int oracles, on the simple_DHS parameter set."""

import numpy as np
import pytest

from cuhe_tpu import hostmath as hm
from cuhe_tpu import poly
from cuhe_tpu.context import Context
from cuhe_tpu.params import make_params

SIMPLE = (5, 2, 1, 61, 20, 8191)


@pytest.fixture(scope="module")
def ctx():
    return Context(make_params(*SIMPLE))


def _rand_poly(rng, n, q):
    nbits = q.bit_length() + 16
    out = []
    for _ in range(n):
        v = int.from_bytes(rng.bytes((nbits + 7) // 8), "little") % q
        out.append(v)
    return out


def test_raw_crt_roundtrip(ctx, rng):
    pr = ctx.params
    q = pr.coeff_modulus(0)
    coeffs = _rand_poly(rng, pr.mod_len, q)
    ct = poly.ctxt_from_ints(coeffs, 0)
    ct_c = poly.to_crt(ctx, ct)
    # residues must match
    cr = np.asarray(ct_c.data)
    for i in (0, 3, pr.num_crt_prime - 1):
        p = pr.crt_primes[i]
        want = np.array([c % p for c in coeffs[:64]], dtype=np.uint32)
        np.testing.assert_array_equal(cr[i, :64], want)
    # ICRT back
    back = poly.to_ints(ctx, ct_c)
    assert back == coeffs


def test_ntt_crt_roundtrip(ctx, rng):
    pr = ctx.params
    q = pr.coeff_modulus(0)
    coeffs = _rand_poly(rng, pr.mod_len, q)
    ct = poly.ctxt_from_ints(coeffs, 0)
    ct_n = poly.to_ntt(ctx, ct)
    back = poly.to_ints(ctx, ct_n)
    assert back == coeffs


def _oracle_polymul_mod_m_q(a, b, m_size, mod_len, q):
    """(a*b) mod m(x) mod q for m prime (m(x) = 1 + x + ... + x^(m-1)).

    Big-int packed multiplication, cyclic fold mod (x^m_size - 1), then one
    elimination step mod m(x) (since x^m_size - 1 = m(x) * (x - 1)).
    """
    B = 2 * q.bit_length() + mod_len.bit_length() + 4
    B = (B + 7) // 8 * 8
    nb = B // 8
    ia = int.from_bytes(b"".join(int(v).to_bytes(nb, "little") for v in a), "little")
    ib = int.from_bytes(b"".join(int(v).to_bytes(nb, "little") for v in b), "little")
    prod = (ia * ib).to_bytes(2 * mod_len * nb, "little")
    conv = [int.from_bytes(prod[nb * i: nb * (i + 1)], "little")
            for i in range(2 * mod_len - 1)]
    # fold mod x^m_size - 1
    folded = conv[:m_size]
    for i in range(m_size, len(conv)):
        folded[i - m_size] += conv[i]
    folded += [0] * (m_size - len(folded))
    # reduce mod m(x): subtract folded[m-1] * m(x)
    top = folded[m_size - 1]
    out = [(folded[i] - top) % q for i in range(mod_len)]
    return out


def test_polymul_barrett_vs_oracle(ctx, rng):
    pr = ctx.params
    q = pr.coeff_modulus(0)
    a = _rand_poly(rng, pr.mod_len, q)
    b = _rand_poly(rng, pr.mod_len, q)
    got = poly.poly_mul_ints(ctx, a, b, 0)
    want = _oracle_polymul_mod_m_q(a, b, pr.m_size, pr.mod_len, q)
    # got: coefficients mod q via CRT; compare mod q
    assert [g % q for g in got] == want


def test_mod_switch_vs_oracle(ctx, rng):
    pr = ctx.params
    lvl = 0
    q = pr.coeff_modulus(lvl)
    pnum = pr.num_crt_prime_lvl(lvl)
    pt = pr.crt_primes[pnum - 1]
    qq = pr.coeff_modulus(lvl + 1)
    coeffs = _rand_poly(rng, pr.mod_len, q)
    ct = poly.to_crt(ctx, poly.ctxt_from_ints(coeffs, lvl))
    sw = poly.mod_switch(ctx, ct)
    assert sw.level == lvl + 1
    got = poly.to_ints(ctx, sw)

    # oracle (Base.cu:1112-1138 semantics)
    want = []
    for x in coeffs:
        dirty = x % pt
        ep = dirty % pr.mod_msg
        if ep != 0:
            if dirty > (pt - 1) // 2:
                dirty -= ep * pt
            else:
                dirty += ep * pt
        want.append(((x - dirty) // pt) % qq)
    assert got == want


def test_xor_not_gates(ctx, rng):
    pr = ctx.params
    q = pr.coeff_modulus(0)
    a = _rand_poly(rng, pr.mod_len, q)
    b = _rand_poly(rng, pr.mod_len, q)
    ca = poly.to_crt(ctx, poly.ctxt_from_ints(a, 0))
    cb = poly.to_crt(ctx, poly.ctxt_from_ints(b, 0))
    s = poly.to_ints(ctx, poly.c_xor(ctx, ca, cb))
    assert s == [(x + y) % q for x, y in zip(a, b)]

    nt = poly.to_ints(ctx, poly.c_not(ctx, ca))
    want = list(a)
    want[0] = (want[0] + pr.mod_msg - 1) % q
    assert nt == want


@pytest.mark.parametrize("cfg", [(3, 2, 16, 50, 25, 8191),
                                 (5, 2, 16, 50, 25, 8191)])
def test_icrt_fused_matches_scan(cfg):
    """The fused Pallas ICRT (ops/crt.icrt_to_raw_fused, TPU hot path) is
    bit-identical to the scan version, in interpreter mode (two prime
    chains / word counts)."""
    import numpy as np
    import jax.numpy as jnp

    from cuhe_tpu import hostmath as hm
    from cuhe_tpu.ops import crt as crt_ops, modp
    from cuhe_tpu.params import make_params

    pr = make_params(*cfg)
    pn = pr.num_crt_prime
    q, mi, bi = pr.icrt_consts(0)
    w = pr.words_coeff(0)
    m_words = hm.ints_to_words([q], w)[:, 0]
    mi_words = np.stack([hm.ints_to_words([v], w)[:, 0] for v in mi])
    primes = np.array(list(pr.crt_primes), np.uint32)[:pn]
    mus = np.array([modp.barrett_mu(int(p)) for p in primes], np.uint64)
    mus_np = (mus[:, 0].astype(np.uint32), mus[:, 1].astype(np.uint32))
    bi_np = np.array(bi, np.uint32)
    rng = np.random.default_rng(5)
    x = rng.integers(0, primes[None, :, None],
                     size=(2, pn, 1024)).astype(np.uint32)
    want = crt_ops.icrt_to_raw(
        jnp.asarray(x), jnp.asarray(primes),
        (jnp.asarray(mus_np[0]), jnp.asarray(mus_np[1])),
        jnp.asarray(bi_np), jnp.asarray(mi_words), jnp.asarray(m_words))
    got = crt_ops.icrt_to_raw_fused(jnp.asarray(x), primes, mus_np, bi_np,
                                    mi_words, m_words, interpret=True,
                                    block_cols=512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
