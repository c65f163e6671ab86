"""Fused transpose-free NTT kernels (v2) — int8 digit matmuls on the MXU.

This is the round-2 performance redesign of the four-step NTT
(ops/ntt.py, ops/pallas_kernels.py v1).  Three structural changes vs v1:

1. **int8 digit matmuls.**  Every Z_P stage matmul is evaluated as
   ``la`` int8 x int8 -> int32 MXU dots (one per operand digit ``a``
   against the 8-digit twiddle stack), with the byte-position sums
   accumulated by slicing — exact flop count ``la * 8`` digit-matmuls,
   no banding padding (cf. ops/ntt._matmul_modp_i8), at the MXU's
   double int8 rate.  Runtime pairs use the new 8-digit balanced
   decomposition (modp.pair_to_digits8): 64 digit-matmuls per stage.

2. **Transpose-free four-step.**  With the output kept in the
   ``[k1, k2]`` matrix layout ("mat" layout, linear index
   k = k1 + n1*k2), the forward transform is

       stage 1 (left  matmul): B[k1, j2]  = sum_j1 W1[k1, j1] X[j1, j2]
       twiddle:                 C = B * w^(k1*j2)
       stage 2 (right matmul): D[k1, k2] = sum_j2 C[k1, j2] W2[j2, k2]

   and the inverse consumes mat layout directly

       stage 1 (right matmul): A[k1, t2] = sum_k2 X[k1, k2] W2i[k2, t2]
       twiddle:                 B = A * w^-(k1*t2)
       stage 2 (left  matmul): Y[t1, t2] = sum_k1 W1i[t1, k1] B[k1, t2]

   producing natural coefficient order [t1, t2] (t = t2 + n2*t1) with no
   data transposes anywhere in the round trip.  This is the TPU analogue
   of the reference deleting its output permutation work in ntt_3
   (cuhe/Base.cu:417-437): pointwise NTT-domain ops are order-agnostic,
   so circuits stay in mat layout; only std-order edges permute.

3. **Everything between HBM reads fuses in VMEM**: digit decomposition,
   stage dots, byte-position recombination mod P (modp.combine_limb_sums),
   twiddle multiply, and (inverse) the n^-1 scale + per-transform CRT
   reduction epilogue of intt_3_modcrt (cuhe/Base.cu:438-490).

Replicates the math of cuhe/Base.cu:309-842 with the same generator and
scale constants; bit-exactness is asserted against ops/ntt.py (itself
DFT-oracle-tested) in tests/test_ntt_kernels.py.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend availability differs per platform
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from .. import hostmath as hm
from . import modp

P = hm.P

# 32k uses (256,128), not (128,256): ~486M vs ~642M int8 MACs/transform
# (both stages contract 128 at pack=2 -> full 256 systolic depth) and rows
# stay one native lane tile; measured 8.39 vs 9.13 us/transform at b512
# bt=16 (scripts/tpu_probe_32k_fact.py, r3).  bt=32 exceeds VMEM.
_FACTORS = {16384: (128, 128), 32768: (256, 128), 65536: (256, 256)}

# transforms per grid step (VMEM-bounded; bt=8 measured fastest for the
# forward kernel at 16k/64k, 16 at 32k; the 64k inverse only fits at bt=4)
_DEFAULT_BT = {16384: 8, 32768: 16, 65536: 8}
_DEFAULT_BT_INV = {16384: 8, 32768: 8, 65536: 4}


def _compiler_params(grid_dims: int = 1, force_arbitrary: bool = False):
    """Raise Mosaic's scoped-VMEM limit (default 16M): the inverse kernel's
    live set (two digit stacks + 15 band-dot planes) peaks above it.
    CUHE_DIM_SEM=parallel|arbitrary annotates grid dimension semantics
    (read at trace time; used by the perf probes).  force_arbitrary ignores
    the env knob — kernels that accumulate across grid steps (revisited
    output blocks / persistent scratch) must stay sequential."""
    if pltpu is None:
        return None
    # default 80 MB (v5e VMEM is 128): the 32k inverse kernel at bt=8
    # needs 64.11 MB — 112 KB over the old 64 MB limit (r4 KAT run 2)
    mb = int(_os.environ.get("CUHE_VMEM_LIMIT_MB", "80"))
    kw = {"vmem_limit_bytes": mb * 1024 * 1024}
    sem = _os.environ.get("CUHE_DIM_SEM", "")
    if sem and not force_arbitrary:
        kw["dimension_semantics"] = (sem,) * grid_dims
    try:
        return pltpu.CompilerParams(**kw)
    except Exception:  # pragma: no cover - older pallas versions
        return None


def _pow_table(omega: int, n: int) -> np.ndarray:
    pw = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        pw[i] = cur
        cur = cur * omega % P
    return pw


@functools.lru_cache(maxsize=None)
def tables(n: int):
    """Twiddle tables for the transpose-free four-step, digit-stacked for
    flop-minimal band dots (see _dot_left/_dot_right).

    Returns a dict of numpy arrays (int8 digit stacks / uint32 pairs);
    passed to kernels as arguments per the big-tables-as-args policy.
    """
    if n not in _FACTORS:
        raise ValueError(f"unsupported NTT length {n}")
    n1, n2 = _FACTORS[n]
    om = pow(hm.NTT_GEN, 65536 // n, P)
    omi = hm.modinv(om, P)
    pw = _pow_table(om, n)
    pwi = _pow_table(omi, n)
    j1 = np.arange(n1, dtype=np.int64)
    j2 = np.arange(n2, dtype=np.int64)

    def pair(w):
        return ((w & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (w >> np.uint64(32)).astype(np.uint32))

    # forward: W1[k1, j1h], tw[k1, j2], W2[j2, k2]
    w1 = pw[(np.outer(j1, j1[: n1 // 2]) % n1) * n2 % n]
    tw = pw[np.outer(j1, j2) % n]
    w2 = pw[(np.outer(j2, j2) % n2) * n1 % n]
    # inverse: W2i[k2, t2], twi[k1, t2], W1i[t1, k1]
    w2i = pwi[(np.outer(j2, j2) % n2) * n1 % n]
    twi = pwi[np.outer(j1, j2) % n]
    ninv = hm.modinv(n, P)
    # n^-1 folded into the last-stage matrix (the reference folds the same
    # scale into its intt_3 epilogue constants, cuhe/Base.cu:489,656,841):
    # Y = n^-1 (W1i @ B) = (n^-1 W1i) @ B, deleting the kernel's mul_modp
    # epilogue — the inverse goes straight from the last lazy dot to the
    # canonical subtract + per-transform mod-p reduce.
    w1i_u = pwi[(np.outer(j1, j1) % n1) * n2 % n]
    w1i = ((w1i_u.astype(object) * ninv) % P).astype(np.uint64)

    def left_tabs(w, la):
        d8 = modp.balanced_digits8_np(w)
        return {p: _left_packed_np(d8, p) for p in set(
            g[1] for g in _group_plan(la, _pack_for(w.shape[1])))}

    def right_tabs(w, la):
        d8 = modp.balanced_digits8_np(w)
        return {p: _right_packed_np(d8, p) for p in set(
            g[1] for g in _group_plan(la, _pack_for(w.shape[0])))}

    return {
        "n1": n1, "n2": n2,
        "w1": left_tabs(w1, 5),        # {pack: [(8+p-1)*n1, p*n1h] i8}
        "tw": pair(tw),                # [n1, n2] u32 x2
        "w2": right_tabs(w2, 8),       # {pack: [p*n2, (8+p-1)*n2] i8}
        "w2i": right_tabs(w2i, 8),
        "twi": pair(twi),              # [n1, n2] u32 x2
        "w1i": left_tabs(w1i, 8),      # n^-1 pre-folded (see above)
    }


def _pack_for(k: int) -> int:
    """Digits packed per dot so the contraction depth reaches the MXU's
    256 systolic depth: K=64 stages pack 4 digits, K=128 pack 2, K>=256
    pack 1.  (Measured: K=128 dots run the MXU at half utilization.)"""
    return max(1, min(4, 256 // k))


def _group_plan(la: int, pack: int):
    plan = []
    a0 = 0
    while a0 < la:
        p = min(pack, la - a0)
        plan.append((a0, p))
        a0 += p
    return plan


def _left_packed_np(d8: np.ndarray, p: int) -> np.ndarray:
    """[8, m, k] digit stack -> [(8+p-1)*m, p*k] shifted-block matrix:
    row-block c, col-block r holds digit (c - r), so one K=p*k dot against
    p stacked operand digits yields all (8+p-1) byte-position blocks."""
    _, m, k = d8.shape
    t_cnt = 8 + p - 1
    out = np.zeros((t_cnt * m, p * k), np.int8)
    for c in range(t_cnt):
        for r in range(p):
            l = c - r
            if 0 <= l < 8:
                out[c * m:(c + 1) * m, r * k:(r + 1) * k] = d8[l]
    return out


def _right_packed_np(d8: np.ndarray, p: int) -> np.ndarray:
    """[8, k, n] digit stack -> [p*k, (8+p-1)*n] shifted-block matrix."""
    _, k, nn = d8.shape
    t_cnt = 8 + p - 1
    out = np.zeros((p * k, t_cnt * nn), np.int8)
    for r in range(p):
        for c in range(t_cnt):
            l = c - r
            if 0 <= l < 8:
                out[r * k:(r + 1) * k, c * nn:(c + 1) * nn] = d8[l]
    return out


def _band_bound(la: int, k: int) -> int:
    """|T_t| <= min(la,8)*k*2^14; return the bound exponent for the combine."""
    v = min(la, 8) * k * (1 << 14)
    b = max(v.bit_length(), 15)  # |T_t| <= 2^(b-1) < 2^b
    # combine_limb_sums_lazy requires bound <= 27; a factorization whose true
    # bound exceeds it must fail loudly, not clamp into silent wrap-around
    assert b <= 27, f"band bound 2^{b} exceeds the lazy-combine limit (la={la}, k={k})"
    return b


def _dot_left(wtabs, x_digits, m: int, k: int):
    """sum over digit products of W[m, k] @ X[k, cols] mod P, with digit
    groups PACKED along the contraction (K = pack*k reaches the MXU's 256
    systolic depth; see _pack_for/_left_packed_np).

    wtabs: {pack: int8 [(8+p-1)*m, p*k]} shifted-block tables.
    x_digits: list (ascending digit a) of int8 arrays with the contraction
    axis FIRST: [k, ...cols] (concats along axis 0 are contiguous).
    Returns a LAZY pair [m, ...cols] (see combine_limb_sums_lazy).
    """
    la = len(x_digits)
    tail = x_digits[0].shape[1:]
    ts = [None] * (la + 7)
    for a0, p in _group_plan(la, _pack_for(k)):
        xg = (x_digits[a0] if p == 1 else
              jnp.concatenate(x_digits[a0:a0 + p], axis=0))
        xg = xg.reshape(p * k, -1)
        s = jax.lax.dot_general(wtabs[p], xg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        for c in range(8 + p - 1):
            t = a0 + c
            blk = s[c * m:(c + 1) * m].reshape((m,) + tail)
            ts[t] = blk if ts[t] is None else ts[t] + blk
    return modp.combine_limb_sums_lazy(ts, bound_log2=_band_bound(la, k))


def _dot_right(x_digits, wtabs, k: int, n_out: int):
    """sum over digit products of X[..., k] @ W[k, n_out] mod P, digit
    groups packed along the contraction (see _dot_left).

    wtabs: {pack: int8 [p*k, (8+p-1)*n_out]} shifted-block tables.
    x_digits: list (ascending digit a) of int8 arrays, contraction on the
    LAST axis.  Returns a LAZY pair [..., n_out].
    """
    la = len(x_digits)
    nd = x_digits[0].ndim
    ts = [None] * (la + 7)
    for a0, p in _group_plan(la, _pack_for(k)):
        xg = (x_digits[a0] if p == 1 else
              jnp.concatenate(x_digits[a0:a0 + p], axis=-1))
        s = jax.lax.dot_general(
            xg, wtabs[p], (((nd - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)        # [..., (8+p-1)*n_out]
        for c in range(8 + p - 1):
            t = a0 + c
            blk = s[..., c * n_out:(c + 1) * n_out]
            ts[t] = blk if ts[t] is None else ts[t] + blk
    return modp.combine_limb_sums_lazy(ts, bound_log2=_band_bound(la, k))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _const2(*_):
    return (0, 0)


def _flatten_tabs(*tabdicts):
    """Flatten per-stage {pack: table} dicts into (arrays, rebuild_fn)."""
    arrays = []
    shapes = []
    for td in tabdicts:
        keys = sorted(td)
        shapes.append(keys)
        arrays.extend(td[p] for p in keys)

    def rebuild(refs):
        out = []
        i = 0
        for keys in shapes:
            out.append({p: refs[i + j][...] for j, p in enumerate(keys)})
            i += len(keys)
        return out

    return arrays, rebuild


def _fwd_body(x, w1_tabs, w2_tabs, tw, n1: int, n2: int):
    """Shared forward pipeline: u32 [bt, n1h, n2] -> canonical pair
    [bt, n1, n2] (mat layout).  tw: twiddle pair shaped [n1, 1, n2]."""
    n1h = x.shape[1]
    # m-first internal layout: one u32-plane transpose up front buys
    # transpose-free (axis-0) digit stacking for the stage-1 dots
    xt = jnp.swapaxes(x, 0, 1)                    # [n1h, bt, n2]
    xd = modp.u32_to_digits5(xt)
    # stage 1: packed left dots contracting j1 (axis 0) -> [n1, ...]
    b = _dot_left(w1_tabs, xd, n1, n1h)           # lazy [n1, bt, n2]
    c = modp.mul_modp(b, tw)                      # canonical
    cd = modp.pair_to_digits8(c)
    d = _dot_right(cd, w2_tabs, n2, n2)           # lazy [n1, bt, n2]
    d = modp.canonicalize(d)
    return jnp.swapaxes(d[0], 0, 1), jnp.swapaxes(d[1], 0, 1)


def _make_fwd_kernel(bt: int, n1: int, n2: int, rebuild):
    def kernel(*refs):
        x_ref, twlo_ref, twhi_ref = refs[0], refs[1], refs[2]
        olo_ref, ohi_ref = refs[-2], refs[-1]
        w1_tabs, w2_tabs = rebuild(refs[3:-2])
        tw = (twlo_ref[...][:, None, :], twhi_ref[...][:, None, :])
        lo, hi = _fwd_body(x_ref[...], w1_tabs, w2_tabs, tw, n1, n2)
        olo_ref[...] = lo
        ohi_ref[...] = hi

    return kernel


@functools.lru_cache(maxsize=None)
def _fwd_call(n: int, bt: int, interpret: bool):
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    n1h = n1 // 2
    tab_arrays, rebuild = _flatten_tabs(t["w1"], t["w2"])
    kernel = _make_fwd_kernel(bt, n1, n2, rebuild)
    tab_specs = [pl.BlockSpec(a.shape, _const2) for a in tab_arrays]

    @jax.jit
    def call(x, twlo, twhi, *tabs):  # x: u32 [B, n/2], B % bt == 0
        bsz = x.shape[0]
        xm = x.reshape(bsz, n1h, n2)
        out = pl.pallas_call(
            kernel,
            grid=(bsz // bt,),
            in_specs=[
                pl.BlockSpec((bt, n1h, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((n1, n2), _const2),
                pl.BlockSpec((n1, n2), _const2),
            ] + tab_specs,
            out_specs=(pl.BlockSpec((bt, n1, n2), lambda i: (i, 0, 0)),) * 2,
            out_shape=(jax.ShapeDtypeStruct((bsz, n1, n2), jnp.uint32),) * 2,
            interpret=interpret,
            **({} if interpret or _compiler_params() is None
               else {"compiler_params": _compiler_params()}),
        )(xm, twlo, twhi, *tabs)
        return out

    # NOTE: return numpy tables, not jnp arrays: converting here would bind
    # device constants to whatever trace is active at first (cached) call
    # and leak tracers into later traces
    return call, tab_arrays


def ntt_fwd(x, n: int, *, layout: str = "mat", bt: int | None = None,
            interpret: bool = False):
    """Fused forward NTT: uint32 [B, n/2] -> pair of uint32.

    layout="mat": returns [B, n1, n2] pairs in [k1, k2] matrix layout.
    layout="std": returns [B, n] pairs in standard NTT index order
    (k = k1 + n1*k2), bit-identical to ops/ntt.ntt_fwd_u32.
    """
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    bt = bt or _DEFAULT_BT[n]
    b = x.shape[0]
    pad = (-b) % bt
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    call, tab_np = _fwd_call(n, bt, interpret)
    lo, hi = call(x, jnp.asarray(t["tw"][0]), jnp.asarray(t["tw"][1]),
                  *[jnp.asarray(a) for a in tab_np])
    lo, hi = lo[:b], hi[:b]
    if layout == "mat":
        return lo, hi
    # std order: out[k1 + n1*k2] -> [k2, k1] row-major
    return (jnp.swapaxes(lo, -1, -2).reshape(b, n),
            jnp.swapaxes(hi, -1, -2).reshape(b, n))


# ---------------------------------------------------------------------------
# windowed-digit forward kernel (relinearization front end)
# ---------------------------------------------------------------------------
#
# TPU analogue of ntt_1_*_ext_block (cuhe/Base.cu:345-385): the w-bit relin
# digit is windowed out of the RAW multi-word coefficients INSIDE the kernel,
# so the [chunk, batch, n/2] digit stack never exists in HBM.  The digit
# index is the second grid dimension; its word offset / shift are computed
# from pl.program_id at run time (the reference passes them as kernel
# arguments per launch).

def _make_fwd_digit_kernel(bt: int, n1: int, n2: int, w: int, off: int,
                           rebuild):
    mask = (1 << w) - 1 if w < 32 else 0xFFFFFFFF

    def kernel(*refs):
        x_ref, twlo_ref, twhi_ref = refs[0], refs[1], refs[2]
        olo_ref, ohi_ref = refs[-2], refs[-1]
        w1_tabs, w2_tabs = rebuild(refs[3:-2])
        j = pl.program_id(1)
        bit = jnp.uint32(off) + jnp.uint32(w) * j.astype(jnp.uint32)
        k = (bit >> jnp.uint32(5)).astype(jnp.int32)
        sh = bit & jnp.uint32(31)
        # dynamic word-plane selection must go through ref indexing (pl.ds):
        # value-level dynamic_slice has no Mosaic lowering
        lo_w = x_ref[:, pl.ds(k, 1)][:, 0]            # [bt, n1h, n2]
        hi_w = x_ref[:, pl.ds(k + 1, 1)][:, 0]
        # (32 - sh) & 31 keeps the shift amount defined at sh == 0; the
        # where() discards the hi contribution in that case
        val = (lo_w >> sh) | jnp.where(
            sh == jnp.uint32(0), jnp.uint32(0),
            hi_w << ((jnp.uint32(32) - sh) & jnp.uint32(31)))
        val = val & jnp.uint32(mask)                  # [bt, n1h, n2]
        tw = (twlo_ref[...][:, None, :], twhi_ref[...][:, None, :])
        lo, hi = _fwd_body(val, w1_tabs, w2_tabs, tw, n1, n2)
        olo_ref[...] = lo[None]
        ohi_ref[...] = hi[None]

    return kernel


@functools.lru_cache(maxsize=None)
def _fwd_digits_call(n: int, bt: int, c: int, w: int, off: int, span: int,
                     interpret: bool):
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    n1h = n1 // 2
    tab_arrays, rebuild = _flatten_tabs(t["w1"], t["w2"])
    kernel = _make_fwd_digit_kernel(bt, n1, n2, w, off, rebuild)
    tab_specs = [pl.BlockSpec(a.shape, lambda i, j: (0, 0))
                 for a in tab_arrays]

    @jax.jit
    def call(x, twlo, twhi, *tabs):  # x: u32 [B, span, n/2], B % bt == 0
        bsz = x.shape[0]
        xm = x.reshape(bsz, span, n1h, n2)
        out = pl.pallas_call(
            kernel,
            grid=(bsz // bt, c),       # digit innermost: raw block reused
            in_specs=[
                pl.BlockSpec((bt, span, n1h, n2), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((n1, n2), lambda i, j: (0, 0)),
                pl.BlockSpec((n1, n2), lambda i, j: (0, 0)),
            ] + tab_specs,
            out_specs=(pl.BlockSpec((1, bt, n1, n2),
                                    lambda i, j: (j, i, 0, 0)),) * 2,
            out_shape=(jax.ShapeDtypeStruct((c, bsz, n1, n2),
                                            jnp.uint32),) * 2,
            interpret=interpret,
            **({} if interpret or _compiler_params(2) is None
               else {"compiler_params": _compiler_params(2)}),
        )(xm, twlo, twhi, *tabs)
        return out

    return call, tab_arrays


def ntt_fwd_digits(raw, n: int, *, w: int, j0: int, c: int,
                   bt: int | None = None, layout: str = "mat",
                   interpret: bool = False):
    """Fused windowed-digit forward NTTs of digits j0 .. j0+c-1.

    raw: uint32 [..., w32, n/2] RAW word planes (little-endian).  Extracts
    each w-bit digit in-kernel (ntt_1_*_ext_block semantics, matching
    ops/ntt.extract_digit bit-for-bit) and runs the fused forward NTT.
    Returns a uint32 pair [c, ..., n] (mat-linear or std order).
    """
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    lead = raw.shape[:-2]
    w32 = raw.shape[-2]
    half = raw.shape[-1]
    flat = raw.reshape((-1, w32, half))
    b = flat.shape[0]
    bt = bt or _DEFAULT_BT[n]
    base = (w * j0) >> 5
    off = (w * j0) & 31
    span = ((off + w * c - 1) >> 5) + 2
    end = base + span
    if end <= w32:
        xs = flat[:, base:end]
    else:  # zero planes past the top word (extract_digit's k+1 >= w32 case)
        xs = jnp.pad(flat[:, base:w32], ((0, 0), (0, end - w32), (0, 0)))
    pad = (-b) % bt
    if pad:
        xs = jnp.pad(xs, ((0, pad), (0, 0), (0, 0)))
    call, tab_np = _fwd_digits_call(n, bt, c, w, off, span, interpret)
    lo, hi = call(xs, jnp.asarray(t["tw"][0]), jnp.asarray(t["tw"][1]),
                  *[jnp.asarray(a) for a in tab_np])
    lo, hi = lo[:, :b], hi[:, :b]
    if layout == "std":
        lo, hi = mat_to_std((lo, hi), n)
        return (lo.reshape((c,) + lead + (n,)),
                hi.reshape((c,) + lead + (n,)))
    return (lo.reshape((c,) + lead + (n,)), hi.reshape((c,) + lead + (n,)))


# ---------------------------------------------------------------------------
# fully-fused relinearization kernel: digit windowing + forward NTT +
# eval-key contraction in one pallas_call
# ---------------------------------------------------------------------------
#
# TPU analogue of the reference's relinMulAddPerCrt accumulation
# (cuhe/Base.cu:1024-1033) fused behind ntt_1_*_ext_block: for each digit j
# (inner grid dim) the kernel windows the digit out of RAW words, runs the
# forward NTT, multiplies by that digit's eval-key planes and accumulates
#     dst[b, p, :] += ntt(digit_j(raw_b)) * ek[j, p]
# into the revisited output block — the digit NTT pair never exists in HBM.

def _make_relin_kernel(bt: int, n1: int, n2: int, w: int, off: int, rebuild):
    mask = (1 << w) - 1 if w < 32 else 0xFFFFFFFF

    def kernel(*refs):
        (x_ref, twlo_ref, twhi_ref, eklo_ref, ekhi_ref) = refs[:5]
        olo_ref, ohi_ref = refs[-2], refs[-1]
        w1_tabs, w2_tabs = rebuild(refs[5:-2])
        j = pl.program_id(1)
        bit = jnp.uint32(off) + jnp.uint32(w) * j.astype(jnp.uint32)
        k = (bit >> jnp.uint32(5)).astype(jnp.int32)
        sh = bit & jnp.uint32(31)
        lo_w = x_ref[:, pl.ds(k, 1)][:, 0]            # [bt, n1h, n2]
        hi_w = x_ref[:, pl.ds(k + 1, 1)][:, 0]
        val = (lo_w >> sh) | jnp.where(
            sh == jnp.uint32(0), jnp.uint32(0),
            hi_w << ((jnp.uint32(32) - sh) & jnp.uint32(31)))
        val = val & jnp.uint32(mask)
        tw = (twlo_ref[...][:, None, :], twhi_ref[...][:, None, :])
        lo, hi = _fwd_body(val, w1_tabs, w2_tabs, tw, n1, n2)  # [bt, n1, n2]
        ek = (eklo_ref[...], ekhi_ref[...])           # [1, pnum, n1, n2]
        prod = modp.mul_modp((lo[:, None], hi[:, None]), ek)

        @pl.when(j == 0)
        def _init():
            olo_ref[...] = prod[0]
            ohi_ref[...] = prod[1]

        @pl.when(j != 0)
        def _acc():
            acc = modp.add_modp((olo_ref[...], ohi_ref[...]), prod)
            olo_ref[...] = acc[0]
            ohi_ref[...] = acc[1]

    return kernel


@functools.lru_cache(maxsize=None)
def _relin_call(n: int, bt: int, c: int, w: int, off: int, span: int,
                pnum: int, interpret: bool):
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    n1h = n1 // 2
    tab_arrays, rebuild = _flatten_tabs(t["w1"], t["w2"])
    kernel = _make_relin_kernel(bt, n1, n2, w, off, rebuild)
    tab_specs = [pl.BlockSpec(a.shape, lambda i, j: (0, 0))
                 for a in tab_arrays]

    @jax.jit
    def call(x, twlo, twhi, ek_lo, ek_hi, *tabs):
        # x: u32 [B, span, n/2] (B % bt == 0); ek: [c, pnum, n1, n2]
        bsz = x.shape[0]
        xm = x.reshape(bsz, span, n1h, n2)
        ekm = (ek_lo.reshape(c, pnum, n1, n2), ek_hi.reshape(c, pnum, n1, n2))
        out = pl.pallas_call(
            kernel,
            grid=(bsz // bt, c),      # digit innermost: output revisited
            in_specs=[
                pl.BlockSpec((bt, span, n1h, n2), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((n1, n2), lambda i, j: (0, 0)),
                pl.BlockSpec((n1, n2), lambda i, j: (0, 0)),
                pl.BlockSpec((1, pnum, n1, n2), lambda i, j: (j, 0, 0, 0)),
                pl.BlockSpec((1, pnum, n1, n2), lambda i, j: (j, 0, 0, 0)),
            ] + tab_specs,
            out_specs=(pl.BlockSpec((bt, pnum, n1, n2),
                                    lambda i, j: (i, 0, 0, 0)),) * 2,
            out_shape=(jax.ShapeDtypeStruct((bsz, pnum, n1, n2),
                                            jnp.uint32),) * 2,
            interpret=interpret,
            **({} if interpret or _compiler_params(2, True) is None
               else {"compiler_params": _compiler_params(2, True)}),
        )(xm, twlo, twhi, ekm[0], ekm[1], *tabs)
        return out

    return call, tab_arrays


def relin_fused_fit(n: int, pnum: int, bt: int | None = None,
                    w: int = 16) -> int | None:
    """VMEM-fit check for relin_digits_mulacc: returns a workable bt or None.

    The kernel's revisited output block is [bt, pnum, n1, n2] u32 x2 and the
    per-digit eval-key window is [1, pnum, n1, n2] u32 x2 (double-buffered),
    so the footprint scales with pnum*n — fine at the gate config
    (pnum=4, 16k ring) but 25 primes on the 32k ring needs ~400 MB at
    bt=16 against the chip's 128 MB VMEM.  Shrink bt looking for a fit,
    but not below 8: the per-digit eval-key window is re-fetched once per
    batch block, so small bt multiplies that HBM traffic (B/bt * knum *
    pnum*n*8 bytes — gigabytes per relin at the Prince config) and the
    batched ntt_fwd_digits path (pnum-independent windows) wins instead.
    """
    # Calibrated Mosaic scoped-VMEM model (see _OUT_BUFFERS note): the
    # revisited/accumulated output block costs ~8 buffer copies per u32
    # plane, NOT the naive 2 — the optimistic 2-buffer estimate accepted
    # (pnum=14, 32k) at mid Prince levels and Mosaic then OOMed at KAT
    # time (r4 run 5, layer 5).  CUHE_RELIN_VMEM_MB overrides the budget
    # for experiments.
    env = _os.environ.get("CUHE_RELIN_VMEM_MB")
    if env is not None:
        budget = int(env) << 20
    else:
        limit_mb = int(_os.environ.get("CUHE_VMEM_LIMIT_MB", "80"))
        budget = (limit_mb << 20) - (4 << 20)
    bt = bt or _DEFAULT_BT[n]
    # double-buffered input block [bt, span, n1/2, n2] u32; span for the
    # fused path's 16-digit chunk, computed the same way
    # relin_digits_mulacc does (worst-case digit offset 31)
    span_est = ((31 + w * 16 - 1) >> 5) + 2
    while bt >= 8:
        out_bytes = 2 * _OUT_BUFFERS * bt * pnum * n * 4
        ek_bytes = 2 * 2 * pnum * n * 4
        in_bytes = 2 * bt * span_est * (n // 2) * 4
        body = _FWD_BODY_BYTES_PER_ELEM * bt * n + (2 << 20)
        if out_bytes + ek_bytes + in_bytes + body <= budget:
            # the model only orders candidates; Mosaic has the last word
            # (try-compile probing, VERDICT r4 item 5)
            if not _probe_enabled() or _probe_relin(n, bt, 16, w, pnum):
                return bt
        bt //= 2
    return None


def relin_digits_mulacc(raw, ek_pair, n: int, *, w: int, j0: int, c: int,
                        pnum: int, bt: int | None = None,
                        interpret: bool = False):
    """sum_j ntt(digit_{j0+j}(raw)) * ek[j0+j] as ONE fused kernel.

    raw: uint32 [..., w32, n/2]; ek_pair: uint32 pair [knum, pnum_max, n]
    in mat-linear order.  Returns a mat-linear pair [..., pnum, n].
    """
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    lead = raw.shape[:-2]
    w32 = raw.shape[-2]
    half = raw.shape[-1]
    flat = raw.reshape((-1, w32, half))
    b = flat.shape[0]
    bt = bt or _DEFAULT_BT[n]
    bt = min(bt, max(1, b))
    base = (w * j0) >> 5
    off = (w * j0) & 31
    span = ((off + w * c - 1) >> 5) + 2
    end = base + span
    if end <= w32:
        xs = flat[:, base:end]
    else:
        xs = jnp.pad(flat[:, base:w32], ((0, 0), (0, end - w32), (0, 0)))
    pad = (-b) % bt
    if pad:
        xs = jnp.pad(xs, ((0, pad), (0, 0), (0, 0)))
    ek_lo = ek_pair[0][j0:j0 + c, :pnum]
    ek_hi = ek_pair[1][j0:j0 + c, :pnum]
    call, tab_np = _relin_call(n, bt, c, w, off, span, pnum, interpret)
    lo, hi = call(xs, jnp.asarray(t["tw"][0]), jnp.asarray(t["tw"][1]),
                  ek_lo, ek_hi, *[jnp.asarray(a) for a in tab_np])
    return (lo[:b].reshape(lead + (pnum, n)),
            hi[:b].reshape(lead + (pnum, n)))


# ---------------------------------------------------------------------------
# pnum-chunked fused relinearization kernel (Prince-scale configs)
# ---------------------------------------------------------------------------
#
# The single-pass kernel above keeps the whole [bt, pnum, n1, n2] output
# block resident, which stops fitting VMEM around pnum*n ~ 25*32k (the
# Prince config, examples/Prince/Prince.cu:47).  This variant adds a grid
# dimension over chunks of `pc` CRT planes:
#
#     grid = (batch_blocks, pnum_chunks, digits)       [digit innermost]
#
# The output block shrinks to [bt, pc, n1, n2] (revisited/accumulated
# across the innermost digit dimension, flushed per pnum chunk), and the
# digit NTTs — which do not depend on the pnum chunk — are computed ONCE
# per batch block into a persistent VMEM scratch [c, bt, n1, n2] at
# pchunk 0 and re-read for the remaining chunks.  Eval-key traffic stays
# at one [pc, n] window fetch per (batch block, pnum chunk, digit), the
# same total bytes as the single-pass kernel.  Reference equivalents:
# ntt_1_32k_ext_block + relinMulAddPerCrt (cuhe/Base.cu:520-557,
# 1024-1033) behind Relinearization.cu:76-88.

def _make_relin_p_kernel(bt: int, n1: int, n2: int, w: int, off: int,
                         rebuild):
    mask = (1 << w) - 1 if w < 32 else 0xFFFFFFFF

    def kernel(*refs):
        (x_ref, twlo_ref, twhi_ref, eklo_ref, ekhi_ref) = refs[:5]
        olo_ref, ohi_ref, slo_ref, shi_ref = refs[-4:]
        w1_tabs, w2_tabs = rebuild(refs[5:-4])
        k = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(k == 0)
        def _ntt():
            bit = jnp.uint32(off) + jnp.uint32(w) * j.astype(jnp.uint32)
            kw = (bit >> jnp.uint32(5)).astype(jnp.int32)
            sh = bit & jnp.uint32(31)
            lo_w = x_ref[:, pl.ds(kw, 1)][:, 0]        # [bt, n1h, n2]
            hi_w = x_ref[:, pl.ds(kw + 1, 1)][:, 0]
            val = (lo_w >> sh) | jnp.where(
                sh == jnp.uint32(0), jnp.uint32(0),
                hi_w << ((jnp.uint32(32) - sh) & jnp.uint32(31)))
            val = val & jnp.uint32(mask)
            tw = (twlo_ref[...][:, None, :], twhi_ref[...][:, None, :])
            lo, hi = _fwd_body(val, w1_tabs, w2_tabs, tw, n1, n2)
            slo_ref[pl.ds(j, 1)] = lo[None]
            shi_ref[pl.ds(j, 1)] = hi[None]

        ntl = slo_ref[pl.ds(j, 1)][0]                  # [bt, n1, n2]
        nth = shi_ref[pl.ds(j, 1)][0]
        ek = (eklo_ref[...], ekhi_ref[...])            # [1, pc, n1, n2]
        prod = modp.mul_modp((ntl[:, None], nth[:, None]), ek)

        @pl.when(j == 0)
        def _init():
            olo_ref[...] = prod[0]
            ohi_ref[...] = prod[1]

        @pl.when(j != 0)
        def _acc():
            acc = modp.add_modp((olo_ref[...], ohi_ref[...]), prod)
            olo_ref[...] = acc[0]
            ohi_ref[...] = acc[1]

    return kernel


@functools.lru_cache(maxsize=None)
def _relin_p_call(n: int, bt: int, c: int, w: int, off: int, span: int,
                  pc: int, interpret: bool):
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    n1h = n1 // 2
    tab_arrays, rebuild = _flatten_tabs(t["w1"], t["w2"])
    kernel = _make_relin_p_kernel(bt, n1, n2, w, off, rebuild)
    tab_specs = [pl.BlockSpec(a.shape, lambda i, k, j: (0, 0))
                 for a in tab_arrays]

    @jax.jit
    def call(x, twlo, twhi, ek_lo, ek_hi, *tabs):
        # x: u32 [B, span, n/2] (B % bt == 0); ek: [c, pnumP, n1*n2]
        bsz = x.shape[0]
        pnum_p = ek_lo.shape[1]
        npc = pnum_p // pc
        xm = x.reshape(bsz, span, n1h, n2)
        ekm = (ek_lo.reshape(c, pnum_p, n1, n2),
               ek_hi.reshape(c, pnum_p, n1, n2))
        out = pl.pallas_call(
            kernel,
            grid=(bsz // bt, npc, c),
            in_specs=[
                pl.BlockSpec((bt, span, n1h, n2),
                             lambda i, k, j: (i, 0, 0, 0)),
                pl.BlockSpec((n1, n2), lambda i, k, j: (0, 0)),
                pl.BlockSpec((n1, n2), lambda i, k, j: (0, 0)),
                pl.BlockSpec((1, pc, n1, n2), lambda i, k, j: (j, k, 0, 0)),
                pl.BlockSpec((1, pc, n1, n2), lambda i, k, j: (j, k, 0, 0)),
            ] + tab_specs,
            out_specs=(pl.BlockSpec((bt, pc, n1, n2),
                                    lambda i, k, j: (i, k, 0, 0)),) * 2,
            out_shape=(jax.ShapeDtypeStruct((bsz, pnum_p, n1, n2),
                                            jnp.uint32),) * 2,
            scratch_shapes=[pltpu.VMEM((c, bt, n1, n2), jnp.uint32)] * 2,
            interpret=interpret,
            **({} if interpret or _relin_p_compiler_params() is None
               else {"compiler_params": _relin_p_compiler_params()}),
        )(xm, twlo, twhi, ekm[0], ekm[1], *tabs)
        return out

    return call, tab_arrays


def _relin_p_vmem_mb() -> int:
    """Scoped-VMEM limit for the pnum-chunked relin kernel.  Higher than
    the library default 64 MB (v5e VMEM is 128 MB): this kernel's block
    set legitimately needs ~90 MB at the Prince config."""
    return int(_os.environ.get("CUHE_RELIN_P_VMEM_MB", "100"))


def _relin_p_compiler_params():
    if pltpu is None:
        return None
    try:
        return pltpu.CompilerParams(
            vmem_limit_bytes=_relin_p_vmem_mb() * 1024 * 1024)
    except Exception:  # pragma: no cover - older pallas versions
        return None


# Mosaic-measured scoped-VMEM model, calibrated on two Prince-scale compile
# reports (bt=8, c=8, n=32k): scoped = 74.6 M at pc=2 and 125.1 M at pc=5
# -> affine in pc with slope 16.8 M = 2 planes x EIGHT buffer copies x
# bt*n*4 (Mosaic multi-buffers the revisited/accumulated output block far
# beyond the naive double-buffer estimate) and
# intercept 41 M = scratch (16.8) + input block (5.2) + _fwd_body live set
# (~19 M = ~75 B per bt*n element) + tables.
_FWD_BODY_BYTES_PER_ELEM = 75
_OUT_BUFFERS = 8


# ---------------------------------------------------------------------------
# try-compile probing (VERDICT r4 item 5)
# ---------------------------------------------------------------------------
#
# The affine VMEM models above only ORDER the candidate configs; whether a
# config actually fits is decided by asking Mosaic — a grid-1 lowering of
# the exact kernel instance is attempted once per config (cached in-process,
# and across processes via the persistent compilation cache) and the fit
# search walks down on failure.  This deletes model miscalibration as a
# run-aborting failure mode: the r4 KAT aborted at layer 5 because an
# optimistic 2-buffer estimate accepted a config Mosaic later refused, and
# there is no post-trace fallback once a jitted level program is running.
# The reference's analogous fit-to-memory dial is the hand-set `more` knob
# (cuhe/Relinearization.cu:40) — here it is self-tuning.

def _probe_enabled() -> bool:
    return (jax.default_backend() == "tpu"
            and _os.environ.get("CUHE_TRY_COMPILE", "1") == "1")


def _attempt_compile(call, args) -> bool:
    """Lower+compile a jitted callable on abstract args; False on failure.

    Module-level so tests can monkeypatch a failing compile to prove the
    fit-search fallback without burning a real Mosaic compile.
    """
    try:
        call.lower(*args).compile()
        return True
    except Exception as e:  # Mosaic OOM / block-shape refusal
        import sys as _sys
        print(f"cuhe_tpu: try-compile probe rejected a kernel config: "
              f"{str(e)[:200]}", file=_sys.stderr, flush=True)
        return False


@functools.lru_cache(maxsize=None)
def _probe_relin(n: int, bt: int, c: int, w: int, pnum: int) -> bool:
    """Grid-1 Mosaic compile attempt of the single-pass relin kernel."""
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    span = ((w * c - 1) >> 5) + 2
    call, tab_np = _relin_call(n, bt, c, w, 0, span, pnum, False)
    S = jax.ShapeDtypeStruct
    args = ([S((bt, span, n // 2), jnp.uint32),
             S((n1, n2), jnp.uint32), S((n1, n2), jnp.uint32),
             S((c, pnum, n), jnp.uint32), S((c, pnum, n), jnp.uint32)]
            + [S(a.shape, a.dtype) for a in tab_np])
    return _attempt_compile(call, args)


@functools.lru_cache(maxsize=None)
def _probe_relin_p(n: int, bt: int, c: int, w: int, pc: int,
                   pnum_p: int) -> bool:
    """Grid-1-batch Mosaic compile attempt of the pnum-chunked kernel."""
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    span = ((w * c - 1) >> 5) + 2
    call, tab_np = _relin_p_call(n, bt, c, w, 0, span, pc, False)
    S = jax.ShapeDtypeStruct
    args = ([S((bt, span, n // 2), jnp.uint32),
             S((n1, n2), jnp.uint32), S((n1, n2), jnp.uint32),
             S((c, pnum_p, n), jnp.uint32), S((c, pnum_p, n), jnp.uint32)]
            + [S(a.shape, a.dtype) for a in tab_np])
    return _attempt_compile(call, args)


def relin_fused_fit_p(n: int, pnum: int, w: int = 16):
    """VMEM fit for the pnum-chunked relin kernel: {bt, pc, c} or None.

    Searches (bt, c, pc) — scratch re-read traffic is B*npc*c*n*8 bytes,
    so a larger fitting pnum chunk wins, but zero-padded planes (pnum
    rounded up to a pc multiple) waste contraction work, so among fitting
    pcs the one minimizing the padded total (then the largest) is chosen;
    bt=8 before 4 because eval-key traffic scales with B/bt.  The budget
    is the kernel's own scoped-VMEM limit (_relin_p_vmem_mb) minus the
    measurement-calibrated _fwd_body live set and the digit tables.
    """
    if pltpu is None:
        return None
    limit = _relin_p_vmem_mb() << 20
    for bt in (8, 4):
        # + tables and a 4 MB safety band: a Mosaic compile failure at KAT
        # time aborts the run (there is no post-trace fallback), so the fit
        # must not sit at the limit's edge
        margin = _FWD_BODY_BYTES_PER_ELEM * bt * n + (6 << 20)
        budget = limit - margin
        for c in (8, 4):
            span = ((w * c - 1) >> 5) + 2
            scratch = 2 * c * bt * n * 4
            xin = 2 * bt * span * (n // 2) * 4
            fitting = []
            for pc in (8, 7, 6, 5, 4, 3, 2, 1):
                if pc > pnum:
                    continue
                out_b = 2 * _OUT_BUFFERS * bt * pc * n * 4
                ek_b = 2 * 2 * pc * n * 4
                if scratch + xin + out_b + ek_b <= budget:
                    fitting.append(pc)
            # fewest pnum chunks first (scratch re-reads scale with npc),
            # then least zero padding, then the largest pc; the model only
            # orders the candidates — each is try-compiled and the search
            # walks on if Mosaic refuses it (VERDICT r4 item 5)
            for pc in sorted(fitting,
                             key=lambda pc: (-(-pnum // pc),
                                             -(-pnum // pc) * pc, -pc)):
                if not _probe_enabled() or _probe_relin_p(n, bt, c, w,
                                                          pc, pc):
                    return {"bt": bt, "pc": pc, "c": c}
    return None


def relin_digits_mulacc_p(raw, ek_pair, n: int, *, w: int, j0: int, c: int,
                          pnum: int, pc: int, bt: int,
                          interpret: bool = False):
    """Pnum-chunked sum_j ntt(digit_{j0+j}(raw)) * ek[j0+j], one kernel.

    Same contract as relin_digits_mulacc (mat-linear eval keys / output)
    but with the output block chunked over `pc` CRT planes so the kernel
    fits VMEM at Prince-scale configs (pnum=25, 32k ring).  pnum is
    zero-padded up to a multiple of pc (zero eval keys contribute zero)
    and the pad is sliced off the result.
    """
    t = tables(n)
    lead = raw.shape[:-2]
    w32 = raw.shape[-2]
    half = raw.shape[-1]
    flat = raw.reshape((-1, w32, half))
    b = flat.shape[0]
    bt = min(bt, max(1, b))
    base = (w * j0) >> 5
    off = (w * j0) & 31
    span = ((off + w * c - 1) >> 5) + 2
    end = base + span
    if end <= w32:
        xs = flat[:, base:end]
    else:
        xs = jnp.pad(flat[:, base:w32], ((0, 0), (0, end - w32), (0, 0)))
    pad = (-b) % bt
    if pad:
        xs = jnp.pad(xs, ((0, pad), (0, 0), (0, 0)))
    pnum_p = -(-pnum // pc) * pc
    ek_lo = ek_pair[0][j0:j0 + c, :pnum]
    ek_hi = ek_pair[1][j0:j0 + c, :pnum]
    if pnum_p != pnum:
        ek_lo = jnp.pad(ek_lo, ((0, 0), (0, pnum_p - pnum), (0, 0)))
        ek_hi = jnp.pad(ek_hi, ((0, 0), (0, pnum_p - pnum), (0, 0)))
    call, tab_np = _relin_p_call(n, bt, c, w, off, span, pc, interpret)
    lo, hi = call(xs, jnp.asarray(t["tw"][0]), jnp.asarray(t["tw"][1]),
                  ek_lo, ek_hi, *[jnp.asarray(a) for a in tab_np])
    return (lo[:b, :pnum].reshape(lead + (pnum, n)),
            hi[:b, :pnum].reshape(lead + (pnum, n)))


# ---------------------------------------------------------------------------
# inverse kernel (+ modcrt epilogue)
# ---------------------------------------------------------------------------

def _make_inv_kernel(bt: int, n1: int, n2: int, rebuild, scal3d: bool):
    def kernel(*refs):
        (xlo_ref, xhi_ref, p_ref, mulo_ref, muhi_ref,
         twlo_ref, twhi_ref) = refs[:7]
        o_ref = refs[-1]
        w2i_tabs, w1i_tabs = rebuild(refs[7:-1])
        # m-first internal layout (see fwd kernel): two u32-plane transposes
        # at load, then every digit concat is a contiguous axis-0 stack
        x = (jnp.swapaxes(xlo_ref[...], 0, 1),
             jnp.swapaxes(xhi_ref[...], 0, 1))            # [n1, bt, n2] mat
        xd = modp.pair_to_digits8(x)
        a = _dot_right(xd, w2i_tabs, n2, n2)              # lazy [n1, bt, n2]
        tw = (twlo_ref[...][:, None, :], twhi_ref[...][:, None, :])
        b = modp.mul_modp(a, tw)                          # canonical
        bd = modp.pair_to_digits8(b)
        # n^-1 is pre-folded into w1i_tabs: the lazy dot result only needs
        # one canonical subtract before the per-transform mod-p reduce
        y = modp.canonicalize(
            _dot_left(w1i_tabs, bd, n1, n1))              # [t1, bt, n2]
        # p/mu arrive lane-replicated with native (x, 128) lane tiles: the
        # old [bt, 1, 1] scalar blocks made Mosaic's grid>1 compile
        # pathological — 412 s vs 28 s for this kernel at grid 2 (r4 probe).
        # Layout depends on bt: [bt, n2] blocks when bt % 8 == 0, else a 3D
        # [bt, 1, n2] block (sublane dim == full array dim, so any bt is
        # legal — the 2D (4, 256) block at 64k's bt=4 failed Mosaic's
        # 8-sublane divisibility rule, the r4 bench crash).
        if scal3d:
            p = jnp.swapaxes(p_ref[...], 0, 1)            # [1, bt, n2]
            mu = (jnp.swapaxes(mulo_ref[...], 0, 1),
                  jnp.swapaxes(muhi_ref[...], 0, 1))
        else:
            p = p_ref[...][None]                          # [1, bt, n2]
            mu = (mulo_ref[...][None], muhi_ref[...][None])
        o_ref[...] = jnp.swapaxes(modp.mod_u32(y, p, mu), 0, 1)

    return kernel


@functools.lru_cache(maxsize=None)
def _inv_call(n: int, bt: int, interpret: bool):
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    tab_arrays, rebuild = _flatten_tabs(t["w2i"], t["w1i"])
    scal3d = bt % 8 != 0
    kernel = _make_inv_kernel(bt, n1, n2, rebuild, scal3d)
    tab_specs = [pl.BlockSpec(a.shape, _const2) for a in tab_arrays]

    @jax.jit
    def call(xlo, xhi, p, mu_lo, mu_hi, twlo, twhi, *tabs):
        bsz = xlo.shape[0]
        # per-transform p/mu, lane-replicated (see kernel note): 2D [B, n2]
        # blocks when bt is sublane-aligned, else 3D [B, 1, n2]
        if scal3d:
            p, mu_lo, mu_hi = (p[:, None], mu_lo[:, None], mu_hi[:, None])
            scal = pl.BlockSpec((bt, 1, n2), lambda i: (i, 0, 0))
        else:
            scal = pl.BlockSpec((bt, n2), lambda i: (i, 0))
        out = pl.pallas_call(
            kernel,
            grid=(bsz // bt,),
            in_specs=[
                pl.BlockSpec((bt, n1, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((bt, n1, n2), lambda i: (i, 0, 0)),
                scal, scal, scal,
                pl.BlockSpec((n1, n2), _const2),
                pl.BlockSpec((n1, n2), _const2),
            ] + tab_specs,
            out_specs=pl.BlockSpec((bt, n1, n2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, n1, n2), jnp.uint32),
            interpret=interpret,
            **({} if interpret or _compiler_params() is None
               else {"compiler_params": _compiler_params()}),
        )(xlo, xhi, p, mu_lo, mu_hi, twlo, twhi, *tabs)
        return out

    return call, tab_arrays


def intt_modcrt(x_pair, n: int, p, mu, *, layout: str = "mat",
                bt: int | None = None, interpret: bool = False):
    """Fused inverse NTT + n^-1 scale + per-transform mod-p reduction.

    x_pair: uint32 pair, [B, n1, n2] (layout="mat") or [B, n]
    (layout="std", standard NTT index order).  p/mu: uint32 [B] prime and
    its Barrett constant pair per transform.  Returns uint32 [B, n] in
    natural coefficient order — bit-identical to ops/ntt.intt_modcrt.
    """
    t = tables(n)
    n1, n2 = t["n1"], t["n2"]
    lo, hi = x_pair
    b = lo.shape[0]
    if layout == "std":
        lo = jnp.swapaxes(lo.reshape(b, n2, n1), -1, -2)
        hi = jnp.swapaxes(hi.reshape(b, n2, n1), -1, -2)
    bt = bt or _DEFAULT_BT_INV[n]
    pad = (-b) % bt
    # lane-replicated [B, n2] p/mu (native-tile blocks; see _make_inv_kernel)
    pv = jnp.broadcast_to(p.reshape(-1, 1), (b, n2))
    ml = jnp.broadcast_to(mu[0].reshape(-1, 1), (b, n2))
    mh = jnp.broadcast_to(mu[1].reshape(-1, 1), (b, n2))
    if pad:
        lo = jnp.pad(lo, ((0, pad), (0, 0), (0, 0)))
        hi = jnp.pad(hi, ((0, pad), (0, 0), (0, 0)))
        pv = jnp.pad(pv, ((0, pad), (0, 0)), constant_values=1)
        ml = jnp.pad(ml, ((0, pad), (0, 0)))
        mh = jnp.pad(mh, ((0, pad), (0, 0)))
    call, tab_np = _inv_call(n, bt, interpret)
    out = call(lo, hi, pv, ml, mh, jnp.asarray(t["twi"][0]),
               jnp.asarray(t["twi"][1]), *[jnp.asarray(a) for a in tab_np])
    return out[:b].reshape(b, n)


# ---------------------------------------------------------------------------
# library front-end: backend dispatch + "linear" (flattened) layouts
# ---------------------------------------------------------------------------
#
# All library call sites (context conversions, Barrett, relinearization, the
# fused gate step) go through fwd_linear / inv_linear.  NTT-domain arrays are
# kept flat [..., n] in **mat-linear** order (row-major [k1, k2] of the
# four-step matrix; global index k1*n2 + k2, a fixed permutation of the
# standard NTT index k1 + n1*k2).  Pointwise mod-P ops are order-agnostic, so
# the permutation is invisible except at fwd/inv edges — where it deletes
# every transpose (VERDICT r1 item 4).

# Read once at import (same rationale as ntt.set_i8_path: Context caches
# jitted transforms, so a later env flip would be silently ignored).  Use
# set_v2_path() to change it explicitly BEFORE building new jits.
_V2_TPU = _os.environ.get("CUHE_NTT_V2", "1") == "1"


def set_v2_path(enabled: bool) -> None:
    """Select the fused Pallas kernels (True) or the XLA four-step (False).

    Takes effect for traces performed after the call; already-jitted
    functions (e.g. a Context's cached transforms) keep their path.
    """
    global _V2_TPU
    _V2_TPU = bool(enabled)


def use_fused() -> bool:
    """Fused Pallas kernels run on TPU; other backends use the XLA path."""
    return _V2_TPU and jax.default_backend() == "tpu"


def fwd_linear(x, n: int, *, layout: str = "mat", bt: int | None = None):
    """Forward NTT of u32 coefficients [..., n/2] -> pair [..., n].

    layout="mat": mat-linear order (row-major [k1, k2]).
    layout="std": standard NTT order, bit-identical to ops/ntt.ntt_fwd_u32.
    """
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    if use_fused():
        lo, hi = ntt_fwd(flat, n, layout="mat", bt=bt)
        if layout == "std":
            lo, hi = mat_to_std((lo, hi), n)
            return lo.reshape(lead + (n,)), hi.reshape(lead + (n,))
        return (lo.reshape(lead + (n,)), hi.reshape(lead + (n,)))
    from . import ntt as ntt_mod

    lo, hi = ntt_mod.ntt_fwd_batched(flat, n, chunk=8)
    if layout == "mat":
        lo, hi = std_to_mat((lo, hi), n)
    return lo.reshape(lead + (n,)), hi.reshape(lead + (n,))


def inv_linear(x_pair, n: int, p, mu, *, layout: str = "mat",
               bt: int | None = None):
    """Inverse NTT + n^-1 scale + mod-p reduce of a pair [..., n].

    p: uint32 broadcastable against the leading dims (e.g. [pnum] for
    [batch, pnum, n] data); mu: matching Barrett pair.  Returns uint32
    [..., n] in natural coefficient order.
    """
    lo, hi = x_pair
    lead = lo.shape[:-1]
    p_b = jnp.broadcast_to(p, lead).reshape(-1)
    mu_b = (jnp.broadcast_to(mu[0], lead).reshape(-1),
            jnp.broadcast_to(mu[1], lead).reshape(-1))
    flat = (lo.reshape(-1, n), hi.reshape(-1, n))
    if use_fused():
        if layout == "mat":
            n1, n2 = _FACTORS[n]
            xm = tuple(v.reshape(-1, n1, n2) for v in flat)
        else:
            xm = std_to_mat(flat, n)
        out = intt_modcrt(xm, n, p_b, mu_b, layout="mat", bt=bt)
        return out.reshape(lead + (n,))
    from . import ntt as ntt_mod

    if layout == "mat":
        n1, n2 = _FACTORS[n]
        flat = mat_to_std(tuple(v.reshape(-1, n1, n2) for v in flat), n)
    out = ntt_mod.intt_modcrt(flat, n, p_b[:, None],
                              (mu_b[0][:, None], mu_b[1][:, None]))
    return out.reshape(lead + (n,))


def mat_to_std(pair, n: int):
    """Permute a mat-layout pair [..., n1, n2] to std order [..., n]."""
    n1, n2 = _FACTORS[n]
    lead = pair[0].shape[:-2]
    return tuple(jnp.swapaxes(v, -1, -2).reshape(lead + (n,)) for v in pair)


def std_to_mat(pair, n: int):
    """Permute a std-order pair [..., n] to mat layout [..., n1, n2]."""
    n1, n2 = _FACTORS[n]
    lead = pair[0].shape[:-1]
    return tuple(jnp.swapaxes(v.reshape(lead + (n2, n1)), -1, -2)
                 for v in pair)
