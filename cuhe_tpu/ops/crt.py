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


def icrt_psum_combine(partial: jnp.ndarray, m_words: jnp.ndarray,
                      axis_name: str, n_shards: int) -> jnp.ndarray:
    """Combine per-shard ICRT partial sums with an explicit psum.

    For a CRT-prime axis sharded over mesh axis `axis_name`, each shard runs
    `icrt_to_raw` on its local primes (its partial is already < M).  The
    cross-shard reduction the reference never needed (one GPU held all
    primes) is done here natively: each u32 word plane is split into 16-bit
    halves so the psum over <= 2^16 shards cannot overflow, halves are
    ripple-recombined, and the total (< n_shards * M) is brought below M by
    n_shards-1 conditional subtracts of M -- the multiword analogue of
    leq_M (cuhe/Base.cu:845-856) applied to the shard sum.

    partial: uint32 [..., words, n] local result; returns the same shape,
    identical on all shards.
    """
    words = partial.shape[-2]
    lo16 = partial & jnp.uint32(0xFFFF)
    hi16 = partial >> jnp.uint32(16)
    lo16 = jax.lax.psum(lo16, axis_name)
    hi16 = jax.lax.psum(hi16, axis_name)
    # ripple: value = sum_w (lo16_w + 2^16 hi16_w) 2^(32 w), each half < 2^32
    s = []
    c = jnp.zeros_like(lo16[..., 0, :])
    for w in range(words):
        lw = lo16[..., w, :]
        hw = hi16[..., w, :]
        h_shift = hw << jnp.uint32(16)          # low 16 bits of hi half
        t1 = lw + h_shift
        c1 = (t1 < lw).astype(jnp.uint32)
        t = t1 + c
        c2 = (t < t1).astype(jnp.uint32)
        c = (hw >> jnp.uint32(16)) + c1 + c2    # spills into next word
        s.append(t)
    top = c  # < n_shards + 2
    m_bc = [jnp.broadcast_to(m_words[w], s[w].shape) for w in range(words)]
    for _ in range(max(1, n_shards - 1)):
        ge = top > 0
        eqrun = jnp.ones_like(s[0], dtype=bool)
        for w in range(words - 1, -1, -1):
            ge = ge | (eqrun & (s[w] > m_bc[w]))
            eqrun = eqrun & (s[w] == m_bc[w])
        ge = ge | eqrun
        bor = jnp.zeros_like(s[0])
        for w in range(words):
            d = s[w] - m_bc[w] - bor
            bor = ((s[w] < m_bc[w])
                   | ((s[w] == m_bc[w]) & (bor > 0))).astype(jnp.uint32)
            s[w] = jnp.where(ge, d, s[w])
        top = jnp.where(ge, top - bor, top)
    return jnp.stack(s, axis=-2)
