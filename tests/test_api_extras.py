"""Coverage for the remaining public API surfaces: plaintext (NX1) gate
variants, multi-level modswitch, the GF(2^16) batcher ring, and ciphertext
checkpointing."""

import numpy as np
import pytest

from cuhe_tpu import poly
from cuhe_tpu.context import Context
from cuhe_tpu.dhs import Batcher
from cuhe_tpu.params import make_params
from cuhe_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def ctx():
    return Context(make_params(3, 2, 16, 50, 25, 8191))


def _rand_poly(rng, n, q):
    return [int.from_bytes(rng.bytes((q.bit_length() + 23) // 8), "little") % q
            for _ in range(n)]


def test_ptxt_gates(ctx, rng):
    """cAnd(ct, pt) / cXor(ct, pt): NX1 broadcast ops (CuHE.cu:123-202)."""
    pr = ctx.params
    q = pr.coeff_modulus(0)
    a = _rand_poly(rng, pr.mod_len, q)
    msg = [int(b) for b in rng.integers(0, 2, pr.mod_len)]

    ca = poly.to_ntt(ctx, poly.ctxt_from_ints(a, 0))
    pt = poly.ptxt_to_ntt(ctx, poly.ptxt_from_ints(msg))

    # XOR with plaintext in NTT domain == coefficient-wise sum mod q
    got = poly.to_ints(ctx, poly.c_xor_ptxt(ctx, ca, pt))
    want = [(x + m) % q for x, m in zip(a, msg)]
    assert got == want

    # XOR with plaintext in CRT domain
    cc = poly.to_crt(ctx, poly.ctxt_from_ints(a, 0))
    ptc = poly.ptxt_to_crt(ctx, poly.ptxt_from_ints(msg))
    got = poly.to_ints(ctx, poly.c_xor_ptxt(ctx, cc, ptc))
    assert got == want

    # AND with plaintext = polynomial product mod m(x) mod q
    prod = poly.c_and_ptxt(ctx, ca, pt)
    got = poly.to_ints(ctx, prod)
    want = poly.poly_mul_ints(ctx, a, [m % q for m in msg], 0)
    assert [g % q for g in got] == [w % q for w in want]


def test_mod_switch_to(ctx, rng):
    pr = ctx.params
    q = pr.coeff_modulus(0)
    a = _rand_poly(rng, pr.mod_len, q)
    ct = poly.to_crt(ctx, poly.ctxt_from_ints(a, 0))
    out = poly.mod_switch_to(ctx, ct, 2)
    assert out.level == 2
    # equivalent to two single modswitches
    step = poly.mod_switch(ctx, poly.mod_switch(ctx, ct))
    np.testing.assert_array_equal(np.asarray(out.data), np.asarray(step.data))


def test_batcher_prince_ring():
    """GF(2^16) factor ring of m = 21845 (the Prince configuration)."""
    import cuhe_tpu.hostmath as hm

    pm = hm.gen_poly_mod(21845)
    assert len(pm) - 1 == 16384
    b = Batcher(pm, 16, 1024)
    rng = np.random.default_rng(5)
    bits = [int(v) for v in rng.integers(0, 2, 1024)]
    enc = b.encode(bits)
    assert len(enc) == 16384 and set(enc) <= {0, 1}
    assert b.decode(enc) == bits


def test_ctxt_checkpoint_roundtrip(ctx, rng, tmp_path):
    pr = ctx.params
    q = pr.coeff_modulus(0)
    a = _rand_poly(rng, pr.mod_len, q)
    for to in (poly.to_crt, poly.to_ntt):
        ct = to(ctx, poly.ctxt_from_ints(a, 0))
        path = str(tmp_path / "ct.npz")
        ckpt.save_ctxt(path, ct)
        back = ckpt.load_ctxt(path)
        assert back.level == ct.level and back.domain == ct.domain
        assert poly.to_ints(ctx, back) == a

def test_ctxt_checkpoint_rejects_factorization_mismatch(ctx, rng, tmp_path):
    """A checkpoint written under a different NTT factorization (e.g. the
    r3 32k (128,256)->(256,128) switch) must refuse to load rather than
    decrypt to garbage (advisor r3)."""
    import numpy as np_
    pr = ctx.params
    q = pr.coeff_modulus(0)
    a = _rand_poly(rng, pr.mod_len, q)
    ct = poly.to_ntt(ctx, poly.ctxt_from_ints(a, 0))
    path = str(tmp_path / "ct.npz")
    ckpt.save_ctxt(path, ct)
    z = dict(np_.load(path))
    assert int(z["format_version"]) == ckpt.FORMAT_VERSION
    # tamper: pretend it was written with a different factorization
    good = z["ntt_factorization"].copy()
    z["ntt_factorization"] = np_.asarray([good[0] // 2, good[1] * 2])
    np_.savez_compressed(path, **z)
    with pytest.raises(ValueError, match="factorization"):
        ckpt.load_ctxt(path)
    # unversioned (pre-r4) NTT-domain checkpoints are also refused
    z.pop("format_version")
    z["ntt_factorization"] = good
    np_.savez_compressed(path, **z)
    with pytest.raises(ValueError, match="unversioned"):
        ckpt.load_ctxt(path)


def test_state_checkpoint_roundtrip_versioned(tmp_path):
    import numpy as np_
    from cuhe_tpu.ops import ntt_kernels as nk
    st = np_.arange(24, dtype=np_.uint32).reshape(2, 3, 4)
    path = str(tmp_path / "st.npz")
    ckpt.save_state(path, st, 3, done=1)
    back, lvl = ckpt.load_state(path)
    assert lvl == 3 and np_.array_equal(np_.asarray(back), st)
    # NTT-domain states validate their factorization tag
    n = 16384
    path2 = str(tmp_path / "st2.npz")
    ckpt.save_state(path2, st, 3, ntt_len=n)
    back2, _ = ckpt.load_state(path2, ntt_len=n)
    assert np_.array_equal(np_.asarray(back2), st)
    z = dict(np_.load(path2))
    z["ntt_factorization"] = np_.asarray([64, 256])
    np_.savez_compressed(path2, **z)
    with pytest.raises(ValueError, match="factorization"):
        ckpt.load_state(path2, ntt_len=n)
