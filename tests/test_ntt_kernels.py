"""Correctness tests for the v2 fused NTT kernels (ops/ntt_kernels.py).

These run the Pallas kernels in interpreter mode on CPU against the
DFT-oracle-tested XLA four-step (ops/ntt.py), so a wrong kernel fails CI
and cannot set the benchmark headline (VERDICT r1 item 2).  bench.py
additionally runs its DFT oracle against the exact path that produces the
headline number on the real chip.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from cuhe_tpu.ops import modp, ntt, ntt_kernels

SLOW = os.environ.get("CUHE_RUN_SLOW")

# 32k/64k exercise the identical kernel code on bigger tables; interpreter
# runs of those take minutes, so they ride the slow gate
_FWD_CASES = [(16384, 1), (16384, 4)] + \
    ([(32768, 2), (65536, 1)] if SLOW else [])


@pytest.mark.parametrize("n,bt", _FWD_CASES)
def test_fwd_matches_xla(n, bt):
    rng = np.random.default_rng(n + bt)
    b = 5 if n == 16384 else 2
    x = rng.integers(0, 1 << 31, size=(b, n // 2), dtype=np.uint32)
    want = ntt.ntt_fwd_u32(jnp.asarray(x), n)
    got = ntt_kernels.ntt_fwd(jnp.asarray(x), n, layout="std", bt=bt,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


@pytest.mark.parametrize("n,bt", [(16384, 2)] + ([(32768, 1)] if SLOW else []))
def test_inv_matches_xla(n, bt):
    rng = np.random.default_rng(n)
    b = 3
    x = rng.integers(0, modp.P, size=(b, n), dtype=np.uint64)
    lo = jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((x >> 32).astype(np.uint32))
    p = np.array([4294967291, 3, 65537], np.uint32)[:b]
    mus = np.array([modp.barrett_mu(int(q)) for q in p], np.uint64)
    mu = (jnp.asarray(mus[:, 0].astype(np.uint32)),
          jnp.asarray(mus[:, 1].astype(np.uint32)))
    want = ntt.intt_modcrt((lo, hi), n, jnp.asarray(p)[:, None],
                           (mu[0][:, None], mu[1][:, None]))
    got = ntt_kernels.intt_modcrt((lo, hi), n, jnp.asarray(p), mu,
                                  layout="std", bt=bt, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mat_roundtrip_identity():
    """fwd(mat) -> intt(mat) with no permutes recovers the input mod p."""
    n = 16384
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 26, size=(3, n // 2), dtype=np.uint32)
    p = np.array([4294967291, 65537, 7681], np.uint32)
    mus = np.array([modp.barrett_mu(int(q)) for q in p], np.uint64)
    mu = (jnp.asarray(mus[:, 0].astype(np.uint32)),
          jnp.asarray(mus[:, 1].astype(np.uint32)))
    fm = ntt_kernels.ntt_fwd(jnp.asarray(x), n, layout="mat", bt=1,
                             interpret=True)
    back = ntt_kernels.intt_modcrt(fm, n, jnp.asarray(p), mu, layout="mat",
                                   bt=3, interpret=True)
    full = np.concatenate([x, np.zeros_like(x)], axis=1).astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(back),
                                  (full % p[:, None]).astype(np.uint32))


def test_mat_std_permutes_inverse():
    n = 32768 if SLOW else 16384
    rng = np.random.default_rng(5)
    x = rng.integers(0, 1 << 31, size=(2, n // 2), dtype=np.uint32)
    mat = ntt_kernels.ntt_fwd(jnp.asarray(x), n, layout="mat", bt=2,
                              interpret=True)
    std = ntt_kernels.mat_to_std(mat, n)
    want = ntt.ntt_fwd_u32(jnp.asarray(x), n)
    np.testing.assert_array_equal(np.asarray(std[0]), np.asarray(want[0]))
    back = ntt_kernels.std_to_mat(std, n)
    np.testing.assert_array_equal(np.asarray(back[0]), np.asarray(mat[0]))
    np.testing.assert_array_equal(np.asarray(back[1]), np.asarray(mat[1]))


@pytest.mark.parametrize("w,j0,c", [
    (16, 0, 3),            # aligned windows (flagship relin width)
    (20, 1, 4),            # windows crossing word boundaries
    (13, 7, 3),            # top window's hi word spills past the last word
])
def test_fwd_digits_matches_unfused(w, j0, c):
    """Fused in-kernel digit windowing == extract_digit + fwd, bit-exact."""
    n = 16384
    w32 = 4
    rng = np.random.default_rng(w * 100 + j0)
    raw = rng.integers(0, 1 << 32, size=(2, w32, n // 2),
                       dtype=np.uint64).astype(np.uint32)
    got = ntt_kernels.ntt_fwd_digits(jnp.asarray(raw), n, w=w, j0=j0, c=c,
                                     bt=2, layout="std", interpret=True)
    digits = jnp.stack([ntt.extract_digit(jnp.asarray(raw), w, j, w32)
                        for j in range(j0, j0 + c)])
    want = ntt.ntt_fwd_u32(digits, n)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_relin_mulacc_matches_unfused():
    """Fused digit-NTT + eval-key contraction == unfused composition."""
    n = 16384
    w, w32, knum, pnum = 16, 4, 5, 3
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 1 << 32, size=(2, w32, n // 2),
                       dtype=np.uint64).astype(np.uint32)
    ek_lo = rng.integers(0, 1 << 32, size=(knum, pnum, n),
                         dtype=np.uint64).astype(np.uint32)
    ek_hi = rng.integers(0, 0xFFFFFFFF, size=(knum, pnum, n),
                         dtype=np.uint64).astype(np.uint32)
    got = ntt_kernels.relin_digits_mulacc(
        jnp.asarray(raw), (jnp.asarray(ek_lo), jnp.asarray(ek_hi)), n,
        w=w, j0=1, c=3, pnum=pnum, bt=2, interpret=True)
    # unfused: extract digits 1..3, std-order NTT -> mat order, mul, sum
    digits = jnp.stack([ntt.extract_digit(jnp.asarray(raw), w, j, w32)
                        for j in range(1, 4)])
    dl, dh = ntt.ntt_fwd_u32(digits, n)                # [3, 2, n] std
    dl, dh = ntt_kernels.std_to_mat((dl, dh), n)
    dl = dl.reshape(3, 2, n)
    dh = dh.reshape(3, 2, n)
    el = jnp.asarray(ek_lo[1:4, :pnum]).reshape(3, 1, pnum, n)
    eh = jnp.asarray(ek_hi[1:4, :pnum]).reshape(3, 1, pnum, n)
    prod = modp.mul_modp((dl[:, :, None, :], dh[:, :, None, :]), (el, eh))
    want = prod
    acc = (want[0][0], want[1][0])
    for j in (1, 2):
        acc = modp.add_modp(acc, (want[0][j], want[1][j]))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(acc[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(acc[1]))


def test_pair_to_digits8_exact():
    """8-digit balanced decomposition is exact mod P incl. capacity edges."""
    P = modp.P
    rng = np.random.default_rng(0)
    vs = rng.integers(0, P, size=1 << 15, dtype=np.uint64)
    CAP = 0x7F7F7F7F7F7F7F7F
    edges = [(b + d) % P
             for b in (P - 1, 1 << 63, CAP, CAP + 1, 0, 1,
                       0x7F7F7F7F00000000, 0x7F7F7F7FFFFFFFFF)
             for d in range(-2, 3)]
    vs = np.concatenate([vs, np.array(edges, dtype=np.uint64)])
    lo = jnp.asarray((vs & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((vs >> 32).astype(np.uint32))
    ds = [np.asarray(d).astype(np.int64) for d in
          modp.pair_to_digits8((lo, hi))]
    tot = sum(d.astype(object) * (256 ** i) for i, d in enumerate(ds))
    assert all((int(t) - int(v)) % P == 0
               for v, t in zip(vs.astype(object), tot))


def test_relin_fused_fit_vmem_guard():
    """The fully-fused relin kernel must not be selected for configs whose
    revisited output block ([bt, pnum, n1, n2] u32 x2) cannot fit VMEM —
    the Prince config (25 primes, 32k ring) OOMed at 636M/128M before the
    guard (r3).  The gate-benchmark config must keep the fused path."""
    assert ntt_kernels.relin_fused_fit(16384, 4) == 8          # gate config: fused
    assert ntt_kernels.relin_fused_fit(32768, 25) is None      # Prince depth-25: fall back
    # mid-size configs exceed the measured 8-buffer output cost (r4 run 5
    # OOMed at pnum=14, 32k under the old 2-buffer estimate) and must
    # fall back to the pnum-chunked kernel
    assert ntt_kernels.relin_fused_fit(32768, 14) is None
    assert ntt_kernels.relin_fused_fit_p(32768, 14, 16) is not None


def test_fit_try_compile_fallback(monkeypatch):
    """The VMEM model only orders candidates; Mosaic decides via a
    try-compile probe, and the fit search walks down when a compile is
    refused instead of shipping a config that aborts at run time
    (VERDICT r4 item 5).  Probes are faked so no TPU is needed."""
    monkeypatch.setattr(ntt_kernels, "_probe_enabled", lambda: True)

    rejected = []

    def probe(n, bt, c, w, pnum):
        rejected.append(bt)
        return False                      # Mosaic refuses every config

    monkeypatch.setattr(ntt_kernels, "_probe_relin", probe)
    # the model accepts bt=8 at the gate config, but the probe's refusal
    # must drive the result to None (-> pnum-chunked / batched fallback)
    assert ntt_kernels.relin_fused_fit(16384, 4) is None
    assert rejected == [8]

    seen = []

    def probe_p(n, bt, c, w, pc, pnum_p):
        seen.append((bt, c, pc))
        return len(seen) > 1              # refuse only the first candidate

    monkeypatch.setattr(ntt_kernels, "_probe_relin_p", probe_p)
    fit = ntt_kernels.relin_fused_fit_p(32768, 25, 16)
    assert fit is not None and len(seen) >= 2
    assert (fit["bt"], fit["c"], fit["pc"]) == seen[1]


@pytest.mark.parametrize("pnum,pc,c,j0", [
    (3, 2, 3, 1),          # pnum padded to 4 (zero-ek planes sliced off)
    (5, 2, 4, 0),          # multiple pnum chunks + padding
    (4, 4, 2, 2),          # single chunk degenerates to the one-pass shape
])
def test_relin_mulacc_p_matches_unfused(pnum, pc, c, j0):
    """Pnum-chunked fused relin (VMEM-scratch digit NTT reuse) == unfused
    composition, bit-exact — the Prince-scale kernel (VERDICT r3 item 1)."""
    n = 16384
    w, w32 = 16, 4
    rng = np.random.default_rng(pnum * 37 + pc)
    raw = rng.integers(0, 1 << 32, size=(2, w32, n // 2),
                       dtype=np.uint64).astype(np.uint32)
    ek_lo = rng.integers(0, 1 << 32, size=(j0 + c, pnum, n),
                         dtype=np.uint64).astype(np.uint32)
    ek_hi = rng.integers(0, 0xFFFFFFFF, size=(j0 + c, pnum, n),
                         dtype=np.uint64).astype(np.uint32)
    got = ntt_kernels.relin_digits_mulacc_p(
        jnp.asarray(raw), (jnp.asarray(ek_lo), jnp.asarray(ek_hi)), n,
        w=w, j0=j0, c=c, pnum=pnum, pc=pc, bt=2, interpret=True)
    digits = jnp.stack([ntt.extract_digit(jnp.asarray(raw), w, j, w32)
                        for j in range(j0, j0 + c)])
    dl, dh = ntt.ntt_fwd_u32(digits, n)                # [c, 2, n] std
    dl, dh = ntt_kernels.std_to_mat((dl, dh), n)
    dl = dl.reshape(c, 2, n)
    dh = dh.reshape(c, 2, n)
    el = jnp.asarray(ek_lo[j0:j0 + c]).reshape(c, 1, pnum, n)
    eh = jnp.asarray(ek_hi[j0:j0 + c]).reshape(c, 1, pnum, n)
    prod = modp.mul_modp((dl[:, :, None, :], dh[:, :, None, :]), (el, eh))
    acc = (prod[0][0], prod[1][0])
    for j in range(1, c):
        acc = modp.add_modp(acc, (prod[0][j], prod[1][j]))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(acc[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(acc[1]))


def test_relin_fused_fit_p_prince_config():
    """The pnum-chunked kernel must offer a fit at the Prince config the
    single-pass kernel rejects, with VMEM-sane parameters."""
    fit = ntt_kernels.relin_fused_fit_p(32768, 25, 16)
    assert fit is not None
    assert fit["bt"] >= 4 and fit["pc"] >= 1 and fit["c"] >= 4
    # gate config should also fit (though the single-pass kernel wins there)
    assert ntt_kernels.relin_fused_fit_p(16384, 4, 16) is not None

def test_relinearize_selects_pnum_chunked_path(monkeypatch):
    """relinearize routes through the pnum-chunked kernel (interpret) when
    the single-pass fused kernel does not fit, matching the plain path."""
    from cuhe_tpu.ops import relin as relin_mod

    n, w, w32, knum, pnum = 16384, 16, 4, 5, 3
    rng = np.random.default_rng(99)
    raw = jnp.asarray(rng.integers(0, 1 << 32, size=(2, w32, n // 2),
                                   dtype=np.uint64).astype(np.uint32))
    ek_lo = jnp.asarray(rng.integers(0, 1 << 32, size=(knum, pnum, n),
                                     dtype=np.uint64).astype(np.uint32))
    ek_hi = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(knum, pnum, n),
                                     dtype=np.uint64).astype(np.uint32))
    want = relin_mod.relinearize(raw, ek_lo, ek_hi, w=w, knum=knum,
                                 pnum=pnum, n=n, layout="mat")
    calls = []
    orig = ntt_kernels.relin_digits_mulacc_p

    def spy(*a, **kw):
        kw["interpret"] = True           # CPU backend: interpret the kernel
        calls.append(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(ntt_kernels, "use_fused", lambda: True)
    monkeypatch.setattr(ntt_kernels, "relin_fused_fit",
                        lambda *a, **k: None)
    monkeypatch.setattr(ntt_kernels, "relin_fused_fit_p",
                        lambda *a, **k: {"bt": 2, "pc": 2, "c": 4})
    monkeypatch.setattr(ntt_kernels, "relin_digits_mulacc_p", spy)
    got = relin_mod.relinearize(raw, ek_lo, ek_hi, w=w, knum=knum,
                                pnum=pnum, n=n, layout="mat")
    assert calls, "pnum-chunked path was not selected"
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
