"""Library context: device-resident precomputed tables + jitted op cache.

Replaces the reference's global constant-memory / texture state and init path
(initCuHE -> initNtt / initCrt / initBarrett, cuhe/CuHE.cu:36-50,
cuhe/Operations.cu:161-242) with a single immutable Context object.  Tables
are plain (numpy-backed) arrays; under pjit/GSPMD they are replicated to all
chips, which supersedes the per-device texture binds and peer copies
(Base.cu:58-223).

All domain conversions of the reference's CuPolynomial state machine
(z2r/r2c/c2n/n2c/c2r/r2z, CuHE.cu:317-464) live here as level-indexed jitted
functions.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import hostmath as hm
from .params import Params
from .ops import barrett as barrett_ops
from .ops import crt as crt_ops
from .ops import modp, ntt
from .ops import pointwise as pw
from .ops import relin as relin_ops


def _mu_arrays(primes: list[int]):
    mus = [modp.barrett_mu(p) for p in primes]
    return (np.array([m[0] for m in mus], dtype=np.uint32),
            np.array([m[1] for m in mus], dtype=np.uint32))


def _poly_long_div_mod_p(num_deg: int, m: list[int], p: int) -> np.ndarray:
    """(x^num_deg) div m(x) mod p, m monic.  Returns quotient coeffs int64.

    Host-side replacement for the NTL ZZX division in setPolyModulus
    (Operations.cu:218-219), done per CRT prime (division by a monic poly
    commutes with reduction mod p).
    """
    n = len(m) - 1
    mm = np.array(m, dtype=np.int64) % p
    r = np.zeros(num_deg + 1, dtype=np.int64)
    r[num_deg] = 1
    q = np.zeros(num_deg - n + 1, dtype=np.int64)
    for i in range(num_deg, n - 1, -1):
        c = int(r[i])
        if c:
            q[i - n] = c
            r[i - n: i + 1] = (r[i - n: i + 1] - c * mm) % p
    return q


class Context:
    """Precomputed state for one parameter set (one ring / prime chain)."""

    def __init__(self, params: Params):
        self.params = params
        pr = params
        self.n = pr.ntt_len
        self.mod_len = pr.mod_len
        ps = list(pr.crt_primes)
        self.primes_np = np.array(ps, dtype=np.uint32)
        self.mus_np = _mu_arrays(ps)

        # inv(p_i mod p_j, p_j) matrix (genCrtInvPrimes, Operations.cu:91-100)
        pnum = pr.num_crt_prime
        invp = np.zeros((pnum, pnum), dtype=np.uint32)
        for (i, j), v in pr.crt_inv_primes.items():
            invp[i, j] = v
        self.invp_np = invp

        # per-level ICRT constants (genIcrtByLevel, Operations.cu:107-134)
        self._icrt = {}
        for lvl in range(pr.depth):
            q, mi, bi = pr.icrt_consts(lvl)
            w = pr.words_coeff(lvl)
            pn = pr.num_crt_prime_lvl(lvl)
            m_words = hm.ints_to_words([q], w)[:, 0]
            mi_words = np.stack([hm.ints_to_words([v], w)[:, 0] for v in mi])
            self._icrt[lvl] = (m_words, mi_words,
                               np.array(bi, dtype=np.uint32))

        # NTT tables (shared, cached)
        ntt.get_tables(self.n)

        # Barrett tables: m - x^mod_len and u = x^(2*mod_len-1) div m,
        # reduced per prime (setPolyModulus, Operations.cu:213-238)
        mcoeffs = list(pr.poly_mod)
        u_per_p = []
        m_per_p = []
        for p in ps:
            u_per_p.append(_poly_long_div_mod_p(2 * pr.mod_len - 1, mcoeffs, p))
            mp = np.array(mcoeffs, dtype=np.int64) % p
            mp[pr.mod_len] = 0  # drop x^mod_len term (m - x^n)
            m_per_p.append(mp)
        half = self.n // 2

        def residue_planes(per_p):
            out = np.zeros((pnum, half), dtype=np.uint32)
            for i, v in enumerate(per_p):
                # m has mod_len+1 coeffs but its x^mod_len term was zeroed
                # (m - x^n); clip to the plane length.
                k = min(len(v), half)
                assert not np.any(v[k:]), "non-zero coefficients clipped"
                out[i, :k] = v[:k].astype(np.uint32)
            return out

        self.m_crt_np = residue_planes(m_per_p)
        u_crt_np = residue_planes(u_per_p)
        m_ntt = ntt.ntt_fwd_u32(jnp.asarray(self.m_crt_np), self.n)
        u_ntt = ntt.ntt_fwd_u32(jnp.asarray(u_crt_np), self.n)
        self.m_ntt = (np.asarray(m_ntt[0]), np.asarray(m_ntt[1]))
        self.u_ntt = (np.asarray(u_ntt[0]), np.asarray(u_ntt[1]))

        # eval keys (set by dhs.init_relinearization)
        self.ek_ntt: tuple | None = None

        # Device-resident table bundle: jnp arrays created eagerly so jitted
        # closures capture them as executable parameters, never HLO literals
        # (the axon compile tunnel rejects oversized programs).
        with jax.ensure_compile_time_eval():
            self.j_primes = jnp.asarray(self.primes_np)
            self.j_mus = (jnp.asarray(self.mus_np[0]),
                          jnp.asarray(self.mus_np[1]))
            self.j_invp = jnp.asarray(self.invp_np)
            self.j_icrt = {
                lvl: tuple(jnp.asarray(a) for a in self._icrt[lvl])
                for lvl in range(pr.depth)
            }
            self.j_m_crt = jnp.asarray(self.m_crt_np)
            self.j_m_ntt = (jnp.asarray(self.m_ntt[0]), jnp.asarray(self.m_ntt[1]))
            self.j_u_ntt = (jnp.asarray(self.u_ntt[0]), jnp.asarray(self.u_ntt[1]))

    # ---- convenience views ----
    @property
    def primes(self):
        return self.j_primes

    def mus(self):
        return self.j_mus

    # ------------------------------------------------------------------
    # jitted per-level conversion ops (CuPolynomial state machine)
    # ------------------------------------------------------------------
    def _lvl_consts(self, lvl: int):
        pn = self.params.num_crt_prime_lvl(lvl)
        primes = self.j_primes[:pn]
        mus = (self.j_mus[0][:pn], self.j_mus[1][:pn])
        return pn, primes, mus

    @lru_cache(maxsize=None)
    def _jit_r2c(self, lvl: int):
        _, primes, mus = self._lvl_consts(lvl)

        def f(raw):
            return crt_ops.crt_from_raw(raw, primes, mus)
        return jax.jit(f)

    @lru_cache(maxsize=None)
    def _jit_c2r(self, lvl: int):
        _, primes, mus = self._lvl_consts(lvl)
        m_words, mi_words, bi = self.j_icrt[lvl]

        def f(c):
            return crt_ops.icrt_to_raw(c, primes, mus, bi, mi_words, m_words)
        return jax.jit(f)

    @lru_cache(maxsize=None)
    def _jit_c2n(self, lvl: int):
        n = self.n

        def f(c):
            return ntt.ntt_fwd_batched(c, n)
        return jax.jit(f)

    @lru_cache(maxsize=None)
    def _jit_n2c(self, lvl: int, is_prod: bool):
        pn, primes, mus = self._lvl_consts(lvl)
        n = self.n
        half = n // 2
        mod_len = self.mod_len
        u_ntt = (self.j_u_ntt[0][:pn], self.j_u_ntt[1][:pn])
        m_ntt = (self.j_m_ntt[0][:pn], self.j_m_ntt[1][:pn])
        m_crt = self.j_m_crt[:pn]

        def f(x_pair):
            p_col = primes[:, None]
            mu_col = (mus[0][:, None], mus[1][:, None])
            full = ntt.intt_modcrt(x_pair, n, p_col, mu_col)
            if not is_prod:
                return full[..., :half]
            return barrett_ops.barrett_reduce(
                full, mod_len=mod_len, n=n, u_ntt=u_ntt, m_ntt=m_ntt,
                m_crt=m_crt, primes=primes, mus=mus)
        return jax.jit(f)

    @lru_cache(maxsize=None)
    def _jit_mod_switch(self, lvl: int):
        pn, primes, mus = self._lvl_consts(lvl)
        invp_last = self.j_invp[pn - 1, : pn - 1]
        mod_msg = self.params.mod_msg

        def f(c):
            return pw.mod_switch(c, primes, mus, invp_last, mod_msg)
        return jax.jit(f)

    @lru_cache(maxsize=None)
    def _jit_relin(self, lvl: int):
        if self.ek_ntt is None:
            raise RuntimeError("relinearization keys not initialised")
        pr = self.params
        pn = pr.num_crt_prime_lvl(lvl)
        knum = pr.num_eval_key_lvl(lvl)
        w = pr.log_relin
        n = self.n
        ek_lo, ek_hi = self.ek_ntt

        def f(raw):
            return relin_ops.relinearize(raw, ek_lo, ek_hi,
                                         w=w, knum=knum, pnum=pn, n=n)
        return jax.jit(f)

    @lru_cache(maxsize=None)
    def _jit_mul_one_many(self, lvl: int, chunk: int):
        """Batched raw_b[chunk] x ntt_a -> raw product pipeline (keygen)."""
        pn, primes, mus = self._lvl_consts(lvl)
        n = self.n
        m_words, mi_words, bi = self.j_icrt[lvl]
        mod_len = self.mod_len
        u_ntt = (self.j_u_ntt[0][:pn], self.j_u_ntt[1][:pn])
        m_ntt = (self.j_m_ntt[0][:pn], self.j_m_ntt[1][:pn])
        m_crt = self.j_m_crt[:pn]

        def one(raw_b, a_pair):
            c = crt_ops.crt_from_raw(raw_b, primes, mus)
            b_pair = ntt.ntt_fwd_u32(c, n)
            prod = modp.mul_modp(b_pair, a_pair)
            full = ntt.intt_modcrt(prod, n, primes[:, None],
                                   (mus[0][:, None], mus[1][:, None]))
            red = barrett_ops.barrett_reduce(
                full, mod_len=mod_len, n=n, u_ntt=u_ntt, m_ntt=m_ntt,
                m_crt=m_crt, primes=primes, mus=mus)
            return crt_ops.icrt_to_raw(red, primes, mus, bi, mi_words, m_words)

        def f(raw_batch, a_pair):
            return jax.lax.map(lambda r: one(r, a_pair), raw_batch)
        return jax.jit(f)

    def set_eval_keys(self, ek_lo: np.ndarray, ek_hi: np.ndarray):
        """Install NTT-domain eval keys [num_eval_key, pnum, ntt_len],
        device-resident (supersedes the reference's pinned-host streaming,
        Relinearization.cu:43-88)."""
        with jax.ensure_compile_time_eval():
            self.ek_ntt = (jnp.asarray(ek_lo), jnp.asarray(ek_hi))
        self._jit_relin.cache_clear()
