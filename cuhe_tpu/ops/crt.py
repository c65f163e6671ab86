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
        s = _icrt_accum(list(carry_sum), y,
                        [mi_w[w] for w in range(words)], words)
        s = _icrt_cond_sub_m(s, m_bc, words)
        return tuple(s), None

    init = tuple(zero for _ in range(words + 1))
    xs = (crt, primes[:pnum], mus[0][:pnum], mus[1][:pnum], bi,
          mi_words)
    out, _ = jax.lax.scan(step, init, xs)
    return jnp.moveaxis(jnp.stack(out[:words]), 0, -2)


def _icrt_accum(s, y, mi_w, words):
    """Accumulate y * mi (multiword) into the words+1-plane sum `s`."""
    c = jnp.zeros_like(s[0])
    hi_prev = jnp.zeros_like(s[0])
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
    s[words] = s[words] + hi_prev + c
    return s


def _icrt_cond_sub_m(s, m_bc, words):
    """Conditionally subtract M when sum >= M (leq_M, Base.cu:845-856)."""
    ge = s[words] > 0
    eqrun = jnp.ones_like(s[0], dtype=bool)
    for w in range(words - 1, -1, -1):
        ge = ge | (eqrun & (s[w] > m_bc[w]))
        eqrun = eqrun & (s[w] == m_bc[w])
    ge = ge | eqrun  # equal counts as >=
    bor = jnp.zeros_like(s[0])
    for w in range(words):
        d = s[w] - m_bc[w] - bor
        bor = ((s[w] < m_bc[w])
               | ((s[w] == m_bc[w]) & (bor > 0))).astype(jnp.uint32)
        s[w] = jnp.where(ge, d, s[w])
    s[words] = jnp.where(ge, s[words] - bor, s[words])
    return s


def icrt_to_raw_fused(crt, primes_np, mus_np, bi_np, mi_words_np, m_words_np,
                      *, interpret: bool = False, block_cols: int = 2048):
    """icrt_to_raw as ONE fused Pallas kernel (TPU hot path).

    The lax.scan version round-trips the (words+1)-plane carry state
    through HBM once per prime; here the whole per-coefficient chain
    (mulmod by b_i, multiword accumulate of M/p_i, conditional M
    subtract) runs in VMEM over column blocks, with all per-prime
    constants embedded as scalars.  Bit-identical to icrt_to_raw
    (tests/test_poly_ops.py::test_icrt_fused_matches_scan).

    crt: uint32 [..., pnum, n]; constants as numpy/python values.
    Returns uint32 [..., words, n].
    """
    from jax.experimental import pallas as pl

    pnum, n = crt.shape[-2], crt.shape[-1]
    lead = crt.shape[:-2]
    words = int(len(m_words_np))
    consts = [(int(primes_np[i]), int(mus_np[0][i]), int(mus_np[1][i]),
               int(bi_np[i]), [int(v) for v in mi_words_np[i]])
              for i in range(pnum)]
    m_ints = [int(v) for v in m_words_np]
    cb = min(block_cols, n)
    while n % cb:
        cb //= 2

    def kernel(x_ref, o_ref):
        x = x_ref[...]                               # [1, pnum, cb]
        s = [jnp.zeros_like(x[:, 0]) for _ in range(words + 1)]
        m_bc = [jnp.full_like(s[0], jnp.uint32(mw)) for mw in m_ints]
        for i in range(pnum):
            p_i, mu_lo, mu_hi, b_i, mi_w = consts[i]
            y = modp.mulmod_u32(x[:, i], jnp.uint32(b_i), jnp.uint32(p_i),
                                (jnp.uint32(mu_lo), jnp.uint32(mu_hi)))
            s = _icrt_accum(s, y, [jnp.uint32(v) for v in mi_w], words)
            s = _icrt_cond_sub_m(s, m_bc, words)
        o_ref[...] = jnp.stack(s[:words], axis=1)    # [1, words, cb]

    flat = crt.reshape((-1, pnum, n))
    b = flat.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(b, n // cb),
        in_specs=[pl.BlockSpec((1, pnum, cb), lambda i, j: (i, 0, j))],
        out_specs=pl.BlockSpec((1, words, cb), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, words, n), jnp.uint32),
        interpret=interpret,
    )(flat)
    return out.reshape(lead + (words, n))


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
