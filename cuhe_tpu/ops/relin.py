"""Relinearization (key switching) after ciphertext multiplication.

TPU-native equivalent of cuhe/Relinearization.cu:43-88 + the windowed-digit
NTT (Base.cu:345-385) and the per-prime dot product kernel
(relinMulAddPerCrt, Base.cu:1024-1033).

Design change vs the reference: eval keys live device-resident in HBM as a
single [num_eval_key, pnum, ntt_len] pair (the reference streamed them from
pinned host memory per prime because 2015-era GPUs were small,
Relinearization.cu:81-83); sharding them across the `crt` mesh axis replaces
the streaming double-buffer.  The digit contraction is a lax.scan so only one
[pnum, ntt_len] accumulator is live.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import modp, ntt


def relinearize(raw: jnp.ndarray, ek_lo: jnp.ndarray, ek_hi: jnp.ndarray,
                *, w: int, knum: int, pnum: int, n: int, digit_chunk: int = 8):
    """raw: uint32 [..., w32, raw_len] RAW ciphertext words (level lvl).

    ek_lo/ek_hi: uint32 [num_eval_key, pnum_max, n] eval keys in NTT domain.
    Uses the first `knum` keys and `pnum` planes for this level.
    Returns an NTT-domain pair [..., pnum, n]:
        dst[..., p, :] = sum_j ntt(digit_j(raw)) * ek[j, p].
    Supports leading batch dims.
    """
    w32 = raw.shape[-2]
    batch = raw.shape[:-2]

    def step(acc, xs):
        j, el, eh = xs
        # extract digit j and NTT it inside the scan: peak memory is one
        # [batch, n] pair instead of knum of them (the reference streams the
        # equivalent data from pinned host memory, Relinearization.cu:81-83)
        digit = ntt.extract_digit_dyn(raw, w, j, w32)
        dl, dh = ntt.ntt_fwd_batched(digit, n, chunk=digit_chunk)
        prod = modp.mul_modp((dl[..., None, :], dh[..., None, :]), (el, eh))
        acc = modp.add_modp(acc, prod)
        return acc, None

    init = (jnp.zeros(batch + (pnum, n), jnp.uint32),
            jnp.zeros(batch + (pnum, n), jnp.uint32))
    xs = (jnp.arange(knum, dtype=jnp.uint32),
          ek_lo[:knum, :pnum], ek_hi[:knum, :pnum])
    (acc_lo, acc_hi), _ = jax.lax.scan(step, init, xs)
    return acc_lo, acc_hi
