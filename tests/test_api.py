"""Tests for the reference-flavoured global-context API layer (api.py).

Mirrors the call shapes of the reference's public surface
(cuhe/CuHE.h:46-209): setParameters -> initCuHE -> x2n -> cAnd -> relin ->
modSwitch -> x2z, against plaintext recomputation via the functional API.
"""

import numpy as np

from cuhe_tpu import api, poly


def setup_module():
    api.setParameters(3, 2, 16, 50, 25, 8191)
    api.initCuHE()


def teardown_module():
    api.resetParameters()


def test_domain_state_machine_and_xor():
    ctx = api.context()
    n_coeff = ctx.params.mod_len
    rng = np.random.default_rng(3)
    q = ctx.params.coeff_moduli[0]
    a = [int(v) for v in rng.integers(0, min(q, 1 << 40), size=n_coeff)]
    b = [int(v) for v in rng.integers(0, min(q, 1 << 40), size=n_coeff)]

    x = api.CuCtxt(a, level=0)
    y = api.CuCtxt(b, level=0)
    assert x.domain == poly.ZZX
    x.x2c(); y.x2c()
    assert x.domain == poly.CRT
    z = api.cXor(x, y)
    got = z.x2z()
    want = [(ai + bi) % q for ai, bi in zip(a, b)]
    assert got == want


def test_cand_matches_functional_path():
    ctx = api.context()
    n_coeff = ctx.params.mod_len
    rng = np.random.default_rng(5)
    a = [int(v) for v in rng.integers(0, 1 << 20, size=n_coeff)]
    b = [int(v) for v in rng.integers(0, 1 << 20, size=n_coeff)]

    x = api.CuCtxt(a, level=0).x2n()
    y = api.CuCtxt(b, level=0).x2n()
    z = api.cAnd(x, y)
    got = z.x2z()

    fa = poly.to_ntt(ctx, poly.ctxt_from_ints(a, 0))
    fb = poly.to_ntt(ctx, poly.ctxt_from_ints(b, 0))
    want = poly.to_ints(ctx, poly.c_and(ctx, fa, fb))
    assert got == want


def test_cnot_and_modswitch():
    ctx = api.context()
    n_coeff = ctx.params.mod_len
    rng = np.random.default_rng(9)
    a = [int(v) for v in rng.integers(0, 1 << 20, size=n_coeff)]
    x = api.CuCtxt(a, level=0)
    x.x2c()
    y = api.cNot(x)
    assert y.level == 0
    y.modSwitch()
    assert y.level == 1
    assert y.logq() == ctx.params.log_coeff(1)
