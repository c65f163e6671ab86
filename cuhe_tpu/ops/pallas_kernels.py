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
