"""Library context: device-resident precomputed tables + jitted op cache.

Replaces the reference's global constant-memory / texture state and init path
(initCuHE -> initNtt / initCrt / initBarrett, cuhe/CuHE.cu:36-50,
cuhe/Operations.cu:161-242) with a single immutable Context object.

All domain conversions of the reference's CuPolynomial state machine
(z2r/r2c/c2n/n2c/c2r/r2z, CuHE.cu:317-464) live here as level-indexed jitted
functions.

Table-passing policy (important for remote-device tunnels):
  * small tables (primes, Barrett mus, ICRT words, prime-inverse rows) are
    closed over as host numpy arrays -> embedded as (small) HLO constants;
  * large tables (eval keys, Barrett u/m NTT planes) are device-resident jax
    arrays passed as runtime ARGUMENTS and sliced inside the jit, so they are
    neither baked into the program nor fetched back at lowering time.
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
from .ops import ntt_kernels as nk
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

    def __init__(self, params: Params, ntt_layout: str = "mat"):
        self.params = params
        pr = params
        self.n = pr.ntt_len
        self.mod_len = pr.mod_len
        # NTT-domain order for all device-resident data: "mat" (the v2
        # transpose-free four-step layout, ops/ntt_kernels.py) or "std"
        # (reference NTT index order).  Pointwise ops are order-agnostic;
        # only fwd/inv edges depend on it.
        self.ntt_layout = ntt_layout
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
            m_words = hm.ints_to_words([q], w)[:, 0]
            mi_words = np.stack([hm.ints_to_words([v], w)[:, 0] for v in mi])
            self._icrt[lvl] = (m_words, mi_words, np.array(bi, dtype=np.uint32))

        # NTT twiddle tables (host precompute, embedded as HLO constants)
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
                k = min(len(v), half)
                assert not np.any(v[k:]), "non-zero coefficients clipped"
                out[i, :k] = v[:k].astype(np.uint32)
            return out

        self.m_crt_np = residue_planes(m_per_p)
        u_crt_np = residue_planes(u_per_p)
        # one jitted program (eager op-by-op execution is pathological over
        # remote-device tunnels); results stay device-resident
        fwd = jax.jit(lambda v: nk.fwd_linear(v, self.n,
                                              layout=self.ntt_layout))
        self.m_ntt = fwd(jnp.asarray(self.m_crt_np))   # device pair
        self.u_ntt = fwd(jnp.asarray(u_crt_np))        # device pair
        self.m_crt_dev = jax.device_put(self.m_crt_np)

        # eval keys (set by dhs.init_relinearization): device pair
        self.ek_ntt: tuple | None = None

    # ---- convenience views ----
    @property
    def primes(self):
        return jnp.asarray(self.primes_np)

    def mus(self):
        return (jnp.asarray(self.mus_np[0]), jnp.asarray(self.mus_np[1]))

    def _np_consts(self, lvl: int):
        pn = self.params.num_crt_prime_lvl(lvl)
        return (pn, self.primes_np[:pn],
                (self.mus_np[0][:pn], self.mus_np[1][:pn]))

    def barrett_args(self):
        """Device-resident big-table args: (u_lo, u_hi, m_lo, m_hi, m_crt)."""
        return (self.u_ntt[0], self.u_ntt[1], self.m_ntt[0], self.m_ntt[1],
                self.m_crt_dev)

    # ------------------------------------------------------------------
    # jitted per-level conversion ops (CuPolynomial state machine)
    # ------------------------------------------------------------------
    @lru_cache(maxsize=None)
    def _jitted_r2c(self, lvl: int):
        _, primes, mus = self._np_consts(lvl)

        def f(raw):
            return crt_ops.crt_from_raw(raw, jnp.asarray(primes),
                                        (jnp.asarray(mus[0]),
                                         jnp.asarray(mus[1])))
        return jax.jit(f)

    def _jit_r2c(self, lvl: int):
        return self._jitted_r2c(lvl)

    @lru_cache(maxsize=None)
    def _jitted_c2r(self, lvl: int):
        _, primes, mus = self._np_consts(lvl)
        m_words, mi_words, bi = self._icrt[lvl]

        def f(c):
            if nk.use_fused():
                return crt_ops.icrt_to_raw_fused(c, primes, mus, bi,
                                                 mi_words, m_words)
            return crt_ops.icrt_to_raw(
                c, jnp.asarray(primes),
                (jnp.asarray(mus[0]), jnp.asarray(mus[1])),
                jnp.asarray(bi), jnp.asarray(mi_words), jnp.asarray(m_words))
        return jax.jit(f)

    def _jit_c2r(self, lvl: int):
        return self._jitted_c2r(lvl)

    @lru_cache(maxsize=None)
    def _jitted_c2n(self, lvl: int):
        n = self.n
        layout = self.ntt_layout

        def f(c):
            return nk.fwd_linear(c, n, layout=layout)
        return jax.jit(f)

    def _jit_c2n(self, lvl: int):
        return self._jitted_c2n(lvl)

    @lru_cache(maxsize=None)
    def _jitted_n2c(self, lvl: int, is_prod: bool):
        pn, primes, mus = self._np_consts(lvl)
        n = self.n
        half = n // 2
        mod_len = self.mod_len

        layout = self.ntt_layout

        def f(x_pair, u_lo, u_hi, m_lo, m_hi, m_crt):
            pj = jnp.asarray(primes)
            muj = (jnp.asarray(mus[0]), jnp.asarray(mus[1]))
            full = nk.inv_linear(x_pair, n, pj, muj, layout=layout)
            if not is_prod:
                return full[..., :half]
            return barrett_ops.barrett_reduce(
                full, mod_len=mod_len, n=n,
                u_ntt=(u_lo[:pn], u_hi[:pn]), m_ntt=(m_lo[:pn], m_hi[:pn]),
                m_crt=m_crt[:pn], primes=pj, mus=muj, layout=layout)
        return jax.jit(f)

    def _jit_n2c(self, lvl: int, is_prod: bool):
        jf = self._jitted_n2c(lvl, is_prod)
        return lambda x_pair: jf(x_pair, *self.barrett_args())

    @lru_cache(maxsize=None)
    def _jitted_mod_switch(self, lvl: int):
        pn, primes, mus = self._np_consts(lvl)
        invp_last = self.invp_np[pn - 1, : pn - 1]
        mod_msg = self.params.mod_msg

        def f(c):
            return pw.mod_switch(c, jnp.asarray(primes),
                                 (jnp.asarray(mus[0]), jnp.asarray(mus[1])),
                                 jnp.asarray(invp_last), mod_msg)
        return jax.jit(f)

    def _jit_mod_switch(self, lvl: int):
        return self._jitted_mod_switch(lvl)

    @lru_cache(maxsize=None)
    def _jitted_relin(self, lvl: int):
        pr = self.params
        pn = pr.num_crt_prime_lvl(lvl)
        knum = pr.num_eval_key_lvl(lvl)
        w = pr.log_relin
        n = self.n

        layout = self.ntt_layout

        def f(raw, ek_lo, ek_hi):
            return relin_ops.relinearize(raw, ek_lo, ek_hi, w=w, knum=knum,
                                         pnum=pn, n=n, layout=layout)
        return jax.jit(f)

    def _jit_relin(self, lvl: int):
        if self.ek_ntt is None:
            raise RuntimeError("relinearization keys not initialised")
        jf = self._jitted_relin(lvl)
        return lambda raw: jf(raw, self.ek_ntt[0], self.ek_ntt[1])

    @lru_cache(maxsize=None)
    def _jitted_mul_one_many(self, lvl: int, chunk: int):
        """Batched raw_b[chunk] x ntt_a -> raw product pipeline (keygen)."""
        pn, primes, mus = self._np_consts(lvl)
        n = self.n
        m_words, mi_words, bi = self._icrt[lvl]
        mod_len = self.mod_len

        layout = self.ntt_layout

        def one(raw_b, a_pair, u_lo, u_hi, m_lo, m_hi, m_crt):
            pj = jnp.asarray(primes)
            muj = (jnp.asarray(mus[0]), jnp.asarray(mus[1]))
            c = crt_ops.crt_from_raw(raw_b, pj, muj)
            b_pair = nk.fwd_linear(c, n, layout=layout)
            prod = modp.mul_modp(b_pair, a_pair)
            full = nk.inv_linear(prod, n, pj, muj, layout=layout)
            red = barrett_ops.barrett_reduce(
                full, mod_len=mod_len, n=n,
                u_ntt=(u_lo[:pn], u_hi[:pn]), m_ntt=(m_lo[:pn], m_hi[:pn]),
                m_crt=m_crt[:pn], primes=pj, mus=muj, layout=layout)
            return crt_ops.icrt_to_raw(
                red, pj, muj, jnp.asarray(bi), jnp.asarray(mi_words),
                jnp.asarray(m_words))

        def f(raw_batch, a_pair, u_lo, u_hi, m_lo, m_hi, m_crt):
            return jax.lax.map(
                lambda r: one(r, a_pair, u_lo, u_hi, m_lo, m_hi, m_crt),
                raw_batch)
        return jax.jit(f)

    def _jit_mul_one_many(self, lvl: int, chunk: int):
        jf = self._jitted_mul_one_many(lvl, chunk)
        return lambda raw_batch, a_pair: jf(raw_batch, a_pair,
                                            *self.barrett_args())

    def set_eval_keys(self, ek_lo, ek_hi):
        """Install NTT-domain eval keys [num_eval_key, pnum, ntt_len],
        device-resident (supersedes the reference's pinned-host streaming,
        Relinearization.cu:43-88)."""
        self.ek_ntt = (jax.device_put(ek_lo) if isinstance(ek_lo, np.ndarray)
                       else ek_lo,
                       jax.device_put(ek_hi) if isinstance(ek_hi, np.ndarray)
                       else ek_hi)
