"""Polynomial Barrett reduction mod m(x), entirely in CRT/NTT domains.

TPU-native re-expression of the reference's 5-kernel pipeline plus NTT
round-trips (orchestration cuhe/Operations.cu:460-504, kernels
cuhe/Base.cu:927-1001).  Instead of five separate kernel launches with
device temporaries, the whole reduction is one pure jitted function over
planar [pnum, ntt_len] arrays; XLA fuses the pointwise steps around the two
NTT/INTT pairs.

Given f of degree 2n-2 (the INTT of a ciphertext product) and precomputed
  u = x^(2n-1) div m   (NTT domain, per prime)
  m - x^n              (NTT domain and CRT domain, per prime)
computes f mod m(x), degree < n, per CRT plane.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import modp
from . import ntt_kernels as nk


def _crt_sub(a, b, p):
    """(a - b) mod p for residues a, b < p (planewise)."""
    return jnp.where(a < b, a + p - b, a - b)


def barrett_reduce(f, *, mod_len: int, n: int, u_ntt, m_ntt, m_crt,
                   primes, mus, layout: str = "mat"):
    """f: uint32 [pnum, n] residues of a degree <= 2*mod_len-2 polynomial.

    Returns uint32 [pnum, n//2] (crt_len) residues of f mod m(x).
    u_ntt, m_ntt: pairs [pnum, n] in NTT-domain order `layout`; m_crt:
    uint32 [pnum, n//2] (these hold (m - x^mod_len) as uploaded by
    setPolyModulus, Operations.cu:213-238).
    primes: uint32 [pnum]; mus: Barrett pair for primes.
    """
    pnum = f.shape[-2]
    half = n // 2
    p_row = primes[:pnum]
    mu_row = (mus[0][:pnum], mus[1][:pnum])
    p_col = p_row[:, None]

    # step 1: c1 = intt(u * ntt(f >> (mod_len-1)))        (deg 2n-2)
    g = f[..., mod_len - 1: mod_len - 1 + half]
    t1 = nk.fwd_linear(g, n, layout=layout)
    t1 = modp.mul_modp(t1, u_ntt)
    c1 = nk.inv_linear(t1, n, p_row, mu_row, layout=layout)

    # step 2: zero low mod_len coeffs -> (u*f >> (2n-1)) << n ; take high half
    idx = jnp.arange(n, dtype=jnp.int32)
    c1 = jnp.where(idx >= mod_len, c1, 0)

    # step 3: c2 = intt((m - x^n)_ntt * ntt(c1 >> mod_len))
    h = c1[..., mod_len: mod_len + half]
    t2 = nk.fwd_linear(h, n, layout=layout)
    t2 = modp.mul_modp(t2, m_ntt)
    c2 = nk.inv_linear(t2, n, p_row, mu_row, layout=layout)

    # step 4 (barrett_sub_1): subtract c1 from the high half of f
    mask_high = (idx >= mod_len) & (idx < 2 * mod_len)
    src = jnp.where(mask_high, _crt_sub(f, c1, p_col), f)

    # step 5 (barrett_sub_2): subtract c2 everywhere
    src = _crt_sub(src, c2, p_col)

    # step 6 (barrett_sub_mc): where coeff x^mod_len of a plane is nonzero,
    # subtract (m - x^n) in that plane (final correction, Base.cu:978-1001)
    t = src[..., mod_len][..., None]  # [pnum, 1]
    mc_full = jnp.concatenate(
        [m_crt, jnp.zeros(m_crt.shape[:-1] + (n - half,), jnp.uint32)], axis=-1)
    corrected = _crt_sub(src, mc_full, p_col)
    take = (t > 0) & (idx < mod_len - 1)
    src = jnp.where(take, corrected, src)

    return src[..., :half]
