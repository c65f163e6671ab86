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


def _fwd_kernel(x_ref, w1_ref, twlo_ref, twhi_ref, w2_ref,
                olo_ref, ohi_ref):
    x = x_ref[0]                      # [n1h, n2] uint32
    # ---- stage 1: B[k1, j2] = sum_j1 W1[k1, j1] X[j1, j2]  (mod P) ----
    w1 = w1_ref[...]                  # [8, n1, n1h] bf16
    xl = [((x >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
          for a in range(4)]
    ts = [None] * 11
    for a in range(4):
        for l in range(8):
            prod = jnp.dot(w1[l], xl[a],
                           preferred_element_type=jnp.float32).astype(jnp.int32)
            s = a + l
            ts[s] = prod if ts[s] is None else ts[s] + prod
    b = modp.combine_limb_sums(ts)    # pair [n1, n2]
    # ---- twiddle: C = B * w^(k1 j2) ----
    c = modp.mul_modp(b, (twlo_ref[...], twhi_ref[...]))
    # ---- stage 2: D[k1, k2] = sum_j2 C[k1, j2] W2[j2, k2]  (mod P) ----
    w2 = w2_ref[...]                  # [8, n2, n2] bf16
    cl = modp.pair_to_limbs8(c)
    ts2 = [None] * 15
    for a in range(8):
        ca = cl[a].astype(jnp.bfloat16)
        for l in range(8):
            prod = jnp.dot(ca, w2[l],
                           preferred_element_type=jnp.float32).astype(jnp.int32)
            s = a + l
            ts2[s] = prod if ts2[s] is None else ts2[s] + prod
    d = modp.combine_limb_sums(ts2)   # pair [n1, n2]
    # ---- output: out[k1 + n1*k2] = D[k1, k2]  ->  row-major [n2, n1] ----
    olo_ref[0] = d[0].T
    ohi_ref[0] = d[1].T


@functools.lru_cache(maxsize=None)
def _fwd_callable(n: int, interpret: bool):
    w1, tw_pair, w2, n1, n2 = _fwd_tables_np(n)
    n1h = n1 // 2
    w1j = jnp.asarray(w1, dtype=jnp.bfloat16)
    w2j = jnp.asarray(w2, dtype=jnp.bfloat16)
    twlo = jnp.asarray(tw_pair[0])
    twhi = jnp.asarray(tw_pair[1])

    const = lambda *_: (0, 0, 0)

    def call(x):  # x: uint32 [B, n/2]
        bsz = x.shape[0]
        xm = x.reshape(bsz, n1h, n2)
        grid = (bsz,)
        out = pl.pallas_call(
            _fwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, n1h, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((8, n1, n1h), const),
                pl.BlockSpec((n1, n2), lambda i: (0, 0)),
                pl.BlockSpec((n1, n2), lambda i: (0, 0)),
                pl.BlockSpec((8, n2, n2), const),
            ],
            out_specs=(pl.BlockSpec((1, n2, n1), lambda i: (i, 0, 0)),
                       pl.BlockSpec((1, n2, n1), lambda i: (i, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((bsz, n2, n1), jnp.uint32),) * 2,
            interpret=interpret,
        )(xm, w1j, twlo, twhi, w2j)
        return (out[0].reshape(bsz, n), out[1].reshape(bsz, n))

    return call


def ntt_fwd_pallas(x, n: int, interpret: bool = False):
    """Fused-kernel forward NTT: uint32 [B, n/2] -> pair uint32 [B, n].

    Bit-identical to ops/ntt.ntt_fwd_u32 (same tables, same DFT ordering).
    """
    return _fwd_callable(n, interpret)(x)
