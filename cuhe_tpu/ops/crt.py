"""CRT decomposition / inverse CRT of multi-word RAW coefficients.

TPU-native equivalents of the reference kernels:
  - crt  (cuhe/Base.cu:857-879): reduce each big coefficient mod each prime,
    Horner over 32-bit words.  Here the per-word `% p` is Barrett-based
    (ops/modp.mod_u32) since TPUs have no 64-bit integer divide.
  - icrt (cuhe/Base.cu:880-924): x = sum_i ((x_i * b_i mod p_i) * M/p_i),
    lazily subtracting M to stay below M (leq_M, Base.cu:845-856).  The PTX
    madc carry chains become unrolled uint32 ripple adds inside a lax.scan
    over the prime axis.

Layouts (planar, TPU-friendly):
  RAW:  uint32 [words, raw_len]     (little-endian word planes)
  CRT:  uint32 [pnum, crt_len]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import modp


def crt_from_raw(raw: jnp.ndarray, primes: jnp.ndarray, mus) -> jnp.ndarray:
    """RAW [.., words, n] -> CRT residues [.., pnum, n].

    primes: uint32 [pnum]; mus: pair of uint32 [pnum] Barrett constants.
    """
    words = raw.shape[-2]
    p = primes[..., :, None]                   # [pnum, 1]
    mu = (mus[0][..., :, None], mus[1][..., :, None])
    # Horner from the most-significant word: r = (r * 2^32 + w) mod p
    r = modp.mod_u32((raw[..., words - 1, :][..., None, :],
                      jnp.zeros_like(raw[..., 0:1, :])), p, mu)
    for w in range(words - 2, -1, -1):
        x = (jnp.broadcast_to(raw[..., w, :][..., None, :], r.shape), r)
        r = modp.mod_u32(x, p, mu)
    return r


def icrt_to_raw(crt: jnp.ndarray, primes: jnp.ndarray, mus, bi: jnp.ndarray,
                mi_words: jnp.ndarray, m_words: jnp.ndarray) -> jnp.ndarray:
    """CRT [pnum, n] -> RAW [words, n] with words = m_words size.

    bi:       uint32 [pnum]             inv(M/p_i mod p_i)
    mi_words: uint32 [pnum, words]      little-endian words of M/p_i
    m_words:  uint32 [words]            little-endian words of M

    Supports leading batch dims on `crt` ([..., pnum, n]).
    """
    pnum, n = crt.shape[-2], crt.shape[-1]
    batch = crt.shape[:-2]
    crt = jnp.moveaxis(crt, -2, 0)  # [pnum, ..., n]
    words = int(m_words.shape[0])
    zero = jnp.zeros(batch + (n,), dtype=jnp.uint32)

    m_bc = [jnp.broadcast_to(m_words[w], batch + (n,)) for w in range(words)]

    def step(carry_sum, xs):
        x_i, p_i, mu_lo, mu_hi, b_i, mi_w = xs
        y = modp.mulmod_u32(x_i, b_i, p_i, (mu_lo, mu_hi))  # x_i * b_i mod p_i
        # accumulate y * mi into the multiword sum (words + 1 planes)
        s = list(carry_sum)
        c = jnp.zeros_like(zero)
        hi_prev = jnp.zeros_like(zero)
        for w in range(words):
            lo, hi = modp.mul32(y, mi_w[w])
            t = s[w] + lo
            c0 = (t < s[w]).astype(jnp.uint32)
            t2 = t + hi_prev
            c1 = (t2 < t).astype(jnp.uint32)
            t3 = t2 + c
            c2 = (t3 < t2).astype(jnp.uint32)
            s[w] = t3
            c = c0 + c1 + c2
            hi_prev = hi
        t = s[words] + hi_prev + c
        s[words] = t
        # conditional subtract M when sum >= M (leq_M semantics: >=)
        ge = s[words] > 0
        eqrun = jnp.ones_like(zero, dtype=bool)
        for w in range(words - 1, -1, -1):
            ge = ge | (eqrun & (s[w] > m_bc[w]))
            eqrun = eqrun & (s[w] == m_bc[w])
        ge = ge | eqrun  # equal counts as >=
        bor = jnp.zeros_like(zero)
        for w in range(words):
            d = s[w] - m_bc[w] - bor
            bor = ((s[w] < m_bc[w]) | ((s[w] == m_bc[w]) & (bor > 0))).astype(jnp.uint32)
            s[w] = jnp.where(ge, d, s[w])
        s[words] = jnp.where(ge, s[words] - bor, s[words])
        return tuple(s), None

    init = tuple(zero for _ in range(words + 1))
    xs = (crt, primes[:pnum], mus[0][:pnum], mus[1][:pnum], bi,
          mi_words)
    out, _ = jax.lax.scan(step, init, xs)
    return jnp.moveaxis(jnp.stack(out[:words]), 0, -2)
