"""Relinearization (key switching) after ciphertext multiplication.

TPU-native equivalent of cuhe/Relinearization.cu:43-88 + the windowed-digit
NTT (Base.cu:345-385) and the per-prime dot product kernel
(relinMulAddPerCrt, Base.cu:1024-1033).

Design changes vs the reference:
  * eval keys live device-resident in HBM as a single
    [num_eval_key, pnum, ntt_len] pair (the reference streamed them from
    pinned host memory per prime because 2015-era GPUs were small,
    Relinearization.cu:81-83); sharding them across the `crt` mesh axis
    replaces the streaming double-buffer.
  * (round 2) the digit NTTs run as one BATCHED fused transform per digit
    chunk instead of a lax.scan of single transforms — the v2 Pallas kernel
    amortises across the chunk, and the digit contraction accumulates
    through a log-depth add_modp tree.  Chunking bounds peak memory to
    [chunk, batch, n] pairs (digit_chunk=0 processes all knum at once).
"""

from __future__ import annotations

import os as _os

import jax.numpy as jnp
import numpy as np

from . import modp, ntt
from . import ntt_kernels as nk


def _tree_sum_modp(pair, axis: int = 0):
    """Mod-P sum over `axis` via a log-depth add_modp tree."""
    lo, hi = pair
    m = lo.shape[axis]
    while m > 1:
        half = m // 2
        a = (jnp.take(lo, jnp.arange(half), axis=axis),
             jnp.take(hi, jnp.arange(half), axis=axis))
        b = (jnp.take(lo, jnp.arange(half, 2 * half), axis=axis),
             jnp.take(hi, jnp.arange(half, 2 * half), axis=axis))
        s = modp.add_modp(a, b)
        if m % 2:
            rest = (jnp.take(lo, jnp.arange(2 * half, m), axis=axis),
                    jnp.take(hi, jnp.arange(2 * half, m), axis=axis))
            s = (jnp.concatenate([s[0], rest[0]], axis=axis),
                 jnp.concatenate([s[1], rest[1]], axis=axis))
        lo, hi = s
        m = lo.shape[axis]
    return (jnp.squeeze(lo, axis=axis), jnp.squeeze(hi, axis=axis))


def _auto_digit_chunk(batch_elems: int, pnum: int, n: int, knum: int) -> int:
    """Digit-chunk size bounding the unfused contraction's peak memory.

    The unfused paths materialize a [chunk, batch, pnum, n] mod-P product
    (plus several XLA temporaries of the same size) before the tree sum;
    at the Prince scale (batch 32, 25 primes, 32k ring) chunk=16 peaks
    above 23 GB and OOMs the chip's 15.75 GB HBM (r3 KAT run).  Cap the
    chunk so ~6 such temporaries stay under ~1.5 GB; small configs keep
    chunk=16 (one fused batched NTT per chunk amortizes best).
    """
    per_digit = batch_elems * pnum * n * 8          # one [.., pnum, n] pair
    budget = (3 << 29) // 6                          # ~1.5 GB / 6 temporaries
    return max(1, min(16, budget // max(per_digit, 1), knum))


def relinearize(raw: jnp.ndarray, ek_lo: jnp.ndarray, ek_hi: jnp.ndarray,
                *, w: int, knum: int, pnum: int, n: int,
                layout: str = "mat", digit_chunk: int | None = None):
    """raw: uint32 [..., w32, raw_len] RAW ciphertext words (level lvl).

    ek_lo/ek_hi: uint32 [num_eval_key, pnum_max, n] eval keys in NTT domain
    (same layout as `layout`).  Uses the first `knum` keys and `pnum` planes.
    Returns an NTT-domain pair [..., pnum, n]:
        dst[..., p, :] = sum_j ntt(digit_j(raw)) * ek[j, p].
    Supports leading batch dims.
    """
    w32 = raw.shape[-2]
    batch = raw.shape[:-2]
    nb = len(batch)
    fused_bt = nk.relin_fused_fit(n, pnum, w=w) if nk.use_fused() else None
    # the fused branch below additionally requires mat layout; the chunk
    # decision must use the SAME predicate or a non-mat layout with a
    # fitting fused config would pick chunk=16 while running the unfused
    # path — re-creating the [16, batch, pnum, n] HBM blowup
    # _auto_digit_chunk exists to prevent (advisor r3, medium).
    fused_active = fused_bt is not None and layout == "mat"
    # Prince-scale fallback (round 4): when the single-pass fused kernel
    # does not fit (pnum*n too large for a VMEM-resident output block),
    # use the pnum-chunked kernel instead of the slow batched/unfused
    # paths — it keeps digit windowing + NTT + contraction in one
    # pallas_call per digit chunk, so per-level jit graphs stay small
    # (the r3 KAT's ~7-10 min/level compiles came from the unfused path
    # unrolling ~18 NTT subgraphs per level).
    fit_p = None
    if (not fused_active and layout == "mat" and nk.use_fused()
            and _os.environ.get("CUHE_RELIN_P", "1") == "1"):
        fit_p = nk.relin_fused_fit_p(n, pnum, w)
    if digit_chunk is None:
        # the fused kernels never materialize the [c, .., pnum, n] product,
        # so their chunk is just the inner grid extent; the unfused paths
        # must bound it (see _auto_digit_chunk)
        b_elems = int(np.prod(batch, dtype=np.int64)) if batch else 1
        chunk = (16 if fused_active else
                 fit_p["c"] if fit_p is not None else
                 _auto_digit_chunk(b_elems, pnum, n, knum))
    elif digit_chunk == 0:
        chunk = knum
    else:
        chunk = min(digit_chunk, knum)
    if fit_p is not None:
        # an explicit digit_chunk larger than the fitted c would inflate the
        # (c, bt, n1, n2) VMEM scratch past the budget relin_fused_fit_p
        # validated — a Mosaic OOM abort with no post-trace fallback
        # (advisor r4); the fitted c is a hard cap on that branch
        chunk = min(chunk, fit_p["c"])
    chunk = min(chunk, knum)
    acc = None
    for j0 in range(0, knum, chunk):
        c = min(chunk, knum - j0)
        if fused_active:
            # fully fused (round 3): digit windowing + forward NTT +
            # eval-key contraction in one kernel — neither the digit stack
            # nor the digit-NTT pairs exist in HBM.  Matches the
            # reference's ntt_1_*_ext_block + relinMulAddPerCrt pipeline
            # (Base.cu:345-385, 1024-1033).  (The kernel produces mat
            # order, so it requires mat-linear eval keys.)
            part = nk.relin_digits_mulacc(raw, (ek_lo, ek_hi), n, w=w,
                                          j0=j0, c=c, pnum=pnum,
                                          bt=fused_bt)
        elif fit_p is not None:
            part = nk.relin_digits_mulacc_p(raw, (ek_lo, ek_hi), n, w=w,
                                            j0=j0, c=c, pnum=pnum,
                                            pc=fit_p["pc"], bt=fit_p["bt"])
        elif nk.use_fused():
            dl, dh = nk.ntt_fwd_digits(raw, n, w=w, j0=j0, c=c,
                                       layout=layout)
            ek_shape = (c,) + (1,) * nb + (pnum, n)
            el = ek_lo[j0:j0 + c, :pnum].reshape(ek_shape)
            eh = ek_hi[j0:j0 + c, :pnum].reshape(ek_shape)
            prod = modp.mul_modp((dl[..., None, :], dh[..., None, :]),
                                 (el, eh))
            part = _tree_sum_modp(prod, axis=0)
        else:
            # windowed digits [c, ..., raw_len] (ntt_1_*_ext_block semantics)
            digits = jnp.stack(
                [ntt.extract_digit(raw, w, j, w32) for j in range(j0, j0 + c)])
            dl, dh = nk.fwd_linear(digits, n, layout=layout)  # [c, ..., n]
            ek_shape = (c,) + (1,) * nb + (pnum, n)
            el = ek_lo[j0:j0 + c, :pnum].reshape(ek_shape)
            eh = ek_hi[j0:j0 + c, :pnum].reshape(ek_shape)
            prod = modp.mul_modp((dl[..., None, :], dh[..., None, :]),
                                 (el, eh))
            part = _tree_sum_modp(prod, axis=0)  # [..., pnum, n]
        acc = part if acc is None else modp.add_modp(acc, part)
    return acc
