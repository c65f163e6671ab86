"""Pallas TPU kernels for hot pointwise ops.

First-class fused kernels for the operations the reference implements as
standalone CUDA kernels (ntt_mul / ntt_add, cuhe/Base.cu:1036-1075).  The
limb-pair Goldilocks arithmetic from ops/modp.py is reused *inside* the
kernels (it is plain jnp on values), so Mosaic compiles the whole ~75-op
multiply-reduce chain into one VMEM-resident pass instead of relying on XLA
fusion heuristics.

On non-TPU backends these fall back to the jnp implementations; kernels can
also run under the Pallas interpreter for tests (interpret=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend availability differs per platform
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from . import modp


def _mul_kernel(alo, ahi, blo, bhi, olo, ohi):
    r = modp.mul_modp((alo[...], ahi[...]), (blo[...], bhi[...]))
    olo[...] = r[0]
    ohi[...] = r[1]


def _add_kernel(alo, ahi, blo, bhi, olo, ohi):
    r = modp.add_modp((alo[...], ahi[...]), (blo[...], bhi[...]))
    olo[...] = r[0]
    ohi[...] = r[1]


def _pointwise_call(kernel, a, b, interpret: bool):
    shape = a[0].shape
    flat = 1
    for s in shape:
        flat *= s
    # view as [rows, 1024] tiles when possible for clean (8,128) tiling
    cols = 1024 if flat % 1024 == 0 else shape[-1]
    rows = flat // cols
    def r2(x):
        return x.reshape(rows, cols)
    args = [r2(a[0]), r2(a[1]), r2(b[0]), r2(b[1])]
    row_blk = min(rows, 256)
    grid = (pl.cdiv(rows, row_blk),)
    spec = pl.BlockSpec((row_blk, cols), lambda i: (i, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((rows, cols), jnp.uint32),) * 2,
        interpret=interpret,
    )(*args)
    return out[0].reshape(shape), out[1].reshape(shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ntt_mul_pallas(a_lo, a_hi, b_lo, b_hi, interpret: bool = False):
    """Fused (a * b) mod P over pairs (Pallas replacement of ntt_mul)."""
    return _pointwise_call(_mul_kernel, (a_lo, a_hi), (b_lo, b_hi), interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ntt_add_pallas(a_lo, a_hi, b_lo, b_hi, interpret: bool = False):
    return _pointwise_call(_add_kernel, (a_lo, a_hi), (b_lo, b_hi), interpret)


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Fused forward NTT kernel
# ---------------------------------------------------------------------------
#
# The XLA four-step NTT (ops/ntt.py) is HBM-bound: each stage materialises the
# [8 x 8, m, n] limb-product tensor (several MB per transform) before the
# mod-P recombination.  This kernel runs both stage matmuls on the MXU and
# recombines entirely in VMEM, so HBM traffic collapses to the input residues
# and output pair -- the Pallas analogue of the reference keeping a 512-sample
# working set in shared memory across its three stages (Base.cu:309-437).

import numpy as np

from .. import hostmath as hm
from . import ntt as ntt_mod


def _fwd_tables_np(n: int):
    t = ntt_mod.get_tables(n)
    n1, n2 = t.n1, t.n2
    om = pow(hm.NTT_GEN, 65536 // n, hm.P)
    pw = ntt_mod._pow_table(om, n)
    k1 = np.arange(n1, dtype=np.int64)
    j1 = np.arange(n1 // 2, dtype=np.int64)
    j2 = np.arange(n2, dtype=np.int64)
    k2 = np.arange(n2, dtype=np.int64)
    w1 = pw[(np.outer(k1, j1) % n1) * n2 % n]          # [n1, n1h]
    tw = pw[np.outer(k1, j2) % n]                      # [n1, n2]
    w2 = pw[(np.outer(j2, k2) % n2) * n1 % n]          # [n2, n2]

    def limbs8(w):
        return np.stack([((w >> np.uint64(8 * i)) & np.uint64(0xFF))
                         .astype(np.float32) for i in range(8)])

    tw_pair = ((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
               (tw >> np.uint64(32)).astype(np.uint32))
    return limbs8(w1), tw_pair, limbs8(w2), n1, n2


def _to_bf16(v):
    # Mosaic has no direct u32->bf16 cast; byte values are exact via i32/f32
    return v.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _make_fwd_kernel(bt: int, n1: int, n2: int):
    """Kernel processing `bt` transforms per grid step.

    Matmul strategy: stack limb blocks so each stage issues few LARGE MXU
    matmuls (small [128,64]-ish dots are pipeline-latency-bound):
      stage 1:  [8*n1, n1h] @ [n1h, 4*bt*n2]   (one matmul)
      stage 2:  8 x ([bt*n1, n2] @ [n2, 8*n2])
    Limb-sum blocks are then sliced out of the products and recombined mod P
    on the VPU, all in VMEM.
    """
    n1h = n1 // 2
    cols = bt * n2

    def kernel(x_ref, w1s_ref, twlo_ref, twhi_ref, w2s_ref, olo_ref, ohi_ref):
        x = x_ref[...]                    # [bt, n1h, n2] uint32
        xc = jnp.transpose(x, (1, 0, 2)).reshape(n1h, cols)
        # one stacked stage-1 matmul
        w1s = w1s_ref[...]                # [8*n1, n1h] bf16
        x_stack = jnp.concatenate(
            [_to_bf16((xc >> jnp.uint32(8 * a)) & jnp.uint32(0xFF))
             for a in range(4)], axis=1)  # [n1h, 4*cols]
        s1 = jnp.dot(w1s, x_stack,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
        ts = [None] * 11
        for a in range(4):
            for l in range(8):
                blk = s1[l * n1:(l + 1) * n1, a * cols:(a + 1) * cols]
                t = a + l
                ts[t] = blk if ts[t] is None else ts[t] + blk
        b = modp.combine_limb_sums(ts)    # pair [n1, cols]
        tw_lo = jnp.broadcast_to(twlo_ref[...][:, None, :], (n1, bt, n2)
                                 ).reshape(n1, cols)
        tw_hi = jnp.broadcast_to(twhi_ref[...][:, None, :], (n1, bt, n2)
                                 ).reshape(n1, cols)
        c = modp.mul_modp(b, (tw_lo, tw_hi))
        # rearrange [n1, bt*n2] -> [bt*n1, n2]
        c = tuple(jnp.transpose(v.reshape(n1, bt, n2), (1, 0, 2))
                  .reshape(bt * n1, n2) for v in c)
        w2s = w2s_ref[...]                # [n2, 8*n2] bf16 (column blocks)
        cl = modp.pair_to_limbs8(c)
        ts2 = [None] * 15
        for a in range(8):
            s2 = jnp.dot(_to_bf16(cl[a]), w2s,
                         preferred_element_type=jnp.float32).astype(jnp.int32)
            for l in range(8):
                blk = s2[:, l * n2:(l + 1) * n2]
                t = a + l
                ts2[t] = blk if ts2[t] is None else ts2[t] + blk
        d = modp.combine_limb_sums(ts2)   # pair [bt*n1, n2]
        olo_ref[...] = jnp.transpose(d[0].reshape(bt, n1, n2), (0, 2, 1))
        ohi_ref[...] = jnp.transpose(d[1].reshape(bt, n1, n2), (0, 2, 1))

    return kernel


@functools.lru_cache(maxsize=None)
def _fwd_tables_cached(n: int):
    return _fwd_tables_np(n)


def _fwd_callable(n: int, bt: int, interpret: bool):
    w1, tw_pair, w2, n1, n2 = _fwd_tables_cached(n)
    n1h = n1 // 2
    kernel = _make_fwd_kernel(bt, n1, n2)

    const = lambda *_: (0, 0, 0)

    def call(x):  # x: uint32 [B, n/2], B % bt == 0
        # tables embed as trace-time constants (numpy -> no tracer leaks)
        w1j = jnp.asarray(w1.reshape(8 * n1, n1h), dtype=jnp.bfloat16)
        w2j = jnp.asarray(np.concatenate(list(w2), axis=1),
                          dtype=jnp.bfloat16)  # [n2, 8*n2]
        twlo = jnp.asarray(tw_pair[0])
        twhi = jnp.asarray(tw_pair[1])
        bsz = x.shape[0]
        xm = x.reshape(bsz, n1h, n2)
        grid = (bsz // bt,)
        c2 = lambda i: (0, 0)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, n1h, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((8 * n1, n1h), c2),
                pl.BlockSpec((n1, n2), c2),
                pl.BlockSpec((n1, n2), c2),
                pl.BlockSpec((n2, 8 * n2), c2),
            ],
            out_specs=(pl.BlockSpec((bt, n2, n1), lambda i: (i, 0, 0)),
                       pl.BlockSpec((bt, n2, n1), lambda i: (i, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((bsz, n2, n1), jnp.uint32),) * 2,
            interpret=interpret,
        )(xm, w1j, twlo, twhi, w2j)
        return (out[0].reshape(bsz, n), out[1].reshape(bsz, n))

    return call


def ntt_fwd_pallas(x, n: int, interpret: bool = False, tile: int = 4):
    """Fused-kernel forward NTT: uint32 [B, n/2] -> pair uint32 [B, n].

    Bit-identical to ops/ntt.ntt_fwd_u32 (same tables, same DFT ordering).
    Batch is processed `tile` transforms per grid step (padded as needed).
    """
    b = x.shape[0]
    tile = max(1, min(tile, 16))
    pad = (-b) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    lo, hi = _fwd_callable(n, tile, interpret)(x)
    if pad:
        lo, hi = lo[:b], hi[:b]
    return lo, hi


# ---------------------------------------------------------------------------
# Fused inverse NTT (+ modcrt epilogue) kernel
# ---------------------------------------------------------------------------

def _inv_tables_np(n: int):
    t = ntt_mod.get_tables(n)
    n1, n2 = t.n1, t.n2
    om = pow(hm.NTT_GEN, 65536 // n, hm.P)
    om = hm.modinv(om, hm.P)
    pw = ntt_mod._pow_table(om, n)
    k1 = np.arange(n1, dtype=np.int64)
    j1 = np.arange(n1, dtype=np.int64)
    j2 = np.arange(n2, dtype=np.int64)
    k2 = np.arange(n2, dtype=np.int64)
    w1 = pw[(np.outer(k1, j1) % n1) * n2 % n]          # [n1, n1] full input
    tw = pw[np.outer(k1, j2) % n]                      # [n1, n2]
    w2 = pw[(np.outer(j2, k2) % n2) * n1 % n]          # [n2, n2]

    def limbs8(w):
        return np.stack([((w >> np.uint64(8 * i)) & np.uint64(0xFF))
                         .astype(np.float32) for i in range(8)])

    tw_pair = ((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
               (tw >> np.uint64(32)).astype(np.uint32))
    ninv = hm.modinv(n, hm.P)
    return (limbs8(w1), tw_pair, limbs8(w2), n1, n2,
            (ninv & 0xFFFFFFFF, ninv >> 32))


def _make_inv_kernel(bt: int, n1: int, n2: int, ninv):
    cols = bt * n2

    def kernel(xlo_ref, xhi_ref, p_ref, mulo_ref, muhi_ref,
               w1s_ref, twlo_ref, twhi_ref, w2s_ref, o_ref):
        xlo = jnp.transpose(xlo_ref[...], (1, 0, 2)).reshape(n1, cols)
        xhi = jnp.transpose(xhi_ref[...], (1, 0, 2)).reshape(n1, cols)
        w1s = w1s_ref[...]                # [8*n1, n1] bf16
        x_stack = jnp.concatenate(
            [_to_bf16(l) for l in modp.pair_to_limbs8((xlo, xhi))], axis=1)
        s1 = jnp.dot(w1s, x_stack,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
        ts = [None] * 15
        for a in range(8):
            for l in range(8):
                blk = s1[l * n1:(l + 1) * n1, a * cols:(a + 1) * cols]
                t = a + l
                ts[t] = blk if ts[t] is None else ts[t] + blk
        b = modp.combine_limb_sums(ts)
        tw_lo = jnp.broadcast_to(twlo_ref[...][:, None, :], (n1, bt, n2)
                                 ).reshape(n1, cols)
        tw_hi = jnp.broadcast_to(twhi_ref[...][:, None, :], (n1, bt, n2)
                                 ).reshape(n1, cols)
        c = modp.mul_modp(b, (tw_lo, tw_hi))
        c = tuple(jnp.transpose(v.reshape(n1, bt, n2), (1, 0, 2))
                  .reshape(bt * n1, n2) for v in c)
        w2s = w2s_ref[...]
        cl = modp.pair_to_limbs8(c)
        ts2 = [None] * 15
        for a in range(8):
            s2 = jnp.dot(_to_bf16(cl[a]), w2s,
                         preferred_element_type=jnp.float32).astype(jnp.int32)
            for l in range(8):
                blk = s2[:, l * n2:(l + 1) * n2]
                t = a + l
                ts2[t] = blk if ts2[t] is None else ts2[t] + blk
        d = modp.combine_limb_sums(ts2)   # pair [bt*n1, n2]
        # scale by n^-1 and reduce mod the per-transform prime
        nv = (jnp.full_like(d[0], jnp.uint32(ninv[0])),
              jnp.full_like(d[0], jnp.uint32(ninv[1])))
        y = modp.mul_modp(d, nv)
        y = tuple(jnp.transpose(v.reshape(bt, n1, n2), (0, 2, 1)) for v in y)
        p = p_ref[...][:, :, None]        # [bt, 1, 1]
        mu = (mulo_ref[...][:, :, None], muhi_ref[...][:, :, None])
        o_ref[...] = modp.mod_u32(y, p, mu)

    return kernel


def _inv_callable(n: int, bt: int, interpret: bool):
    w1, tw_pair, w2, n1, n2, ninv = _inv_tables_np(n)
    kernel = _make_inv_kernel(bt, n1, n2, ninv)

    def call(xlo, xhi, p, mu_lo, mu_hi):  # [B, n], [B,1] scalars
        w1j = jnp.asarray(w1.reshape(8 * n1, n1), dtype=jnp.bfloat16)
        w2j = jnp.asarray(np.concatenate(list(w2), axis=1), dtype=jnp.bfloat16)
        twlo = jnp.asarray(tw_pair[0])
        twhi = jnp.asarray(tw_pair[1])
        bsz = xlo.shape[0]
        xm_lo = xlo.reshape(bsz, n1, n2)
        xm_hi = xhi.reshape(bsz, n1, n2)
        grid = (bsz // bt,)
        c2 = lambda i: (0, 0)
        smem = pltpu.SMEM if pltpu is not None else None
        scal = pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=smem)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, n1, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((bt, n1, n2), lambda i: (i, 0, 0)),
                scal, scal, scal,
                pl.BlockSpec((8 * n1, n1), c2),
                pl.BlockSpec((n1, n2), c2),
                pl.BlockSpec((n1, n2), c2),
                pl.BlockSpec((n2, 8 * n2), c2),
            ],
            out_specs=pl.BlockSpec((bt, n2, n1), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, n2, n1), jnp.uint32),
            interpret=interpret,
        )(xm_lo, xm_hi, p, mu_lo, mu_hi, w1j, twlo, twhi, w2j)
        return out.reshape(bsz, n)

    return call


def intt_modcrt_pallas(x_pair, n: int, p, mu, interpret: bool = False,
                       tile: int = 2):
    """Fused inverse NTT + modcrt: pair [B, n] + per-transform p/mu [B] ->
    uint32 [B, n].  Bit-identical to ops/ntt.intt_modcrt."""
    lo, hi = x_pair
    b = lo.shape[0]
    tile = max(1, min(tile, 8))
    pad = (-b) % tile
    pv = p.reshape(-1, 1)
    ml = mu[0].reshape(-1, 1)
    mh = mu[1].reshape(-1, 1)
    if pad:
        lo = jnp.pad(lo, ((0, pad), (0, 0)))
        hi = jnp.pad(hi, ((0, pad), (0, 0)))
        pv = jnp.pad(pv, ((0, pad), (0, 0)), constant_values=1)
        ml = jnp.pad(ml, ((0, pad), (0, 0)))
        mh = jnp.pad(mh, ((0, pad), (0, 0)))
    out = _inv_callable(n, tile, interpret)(lo, hi, pv, ml, mh)
    return out[:b]
