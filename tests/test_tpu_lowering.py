"""Compile-only lowering smoke tests for every Pallas kernel config the
library can select (VERDICT r4 weak #1).

Mosaic's block-shape constraints (8-sublane / 128-lane divisibility) do
not exist in interpret mode, so the interpret-mode correctness suite can
be green while a kernel cannot compile on the real backend — exactly how
the r4 64k-inverse regression shipped (a 2D (4, 256) p/mu block at
bt=4).  These tests .lower().compile() each kernel instance on the TPU
backend with abstract arguments: no data, no execution, but Mosaic gets
the last word.

Gated on a real TPU backend (CUHE_TEST_TPU=1 suite runs); skipped on CPU.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip("TPU-backend lowering smoke tests", allow_module_level=True)

from cuhe_tpu.ops import ntt_kernels as nk

S = jax.ShapeDtypeStruct


def _tab_avals(tab_np):
    return [S(a.shape, a.dtype) for a in tab_np]


def _compile(call, args):
    call.lower(*args).compile()


@pytest.mark.parametrize("n", [16384, 32768, 65536])
def test_fwd_lowers_at_default_bt(n):
    t = nk.tables(n)
    n1, n2 = t["n1"], t["n2"]
    bt = nk._DEFAULT_BT[n]
    call, tab_np = nk._fwd_call(n, bt, False)
    args = [S((2 * bt, n // 2), jnp.uint32),
            S((n1, n2), jnp.uint32), S((n1, n2), jnp.uint32)]
    _compile(call, args + _tab_avals(tab_np))


@pytest.mark.parametrize("n", [16384, 32768, 65536])
def test_inverse_lowers_at_default_bt(n):
    """The r4 regression case: 64k at bt=4 must lower (grid > 1)."""
    t = nk.tables(n)
    n1, n2 = t["n1"], t["n2"]
    bt = nk._DEFAULT_BT_INV[n]
    call, tab_np = nk._inv_call(n, bt, False)
    bsz = 2 * bt
    args = [S((bsz, n1, n2), jnp.uint32), S((bsz, n1, n2), jnp.uint32),
            S((bsz, n2), jnp.uint32), S((bsz, n2), jnp.uint32),
            S((bsz, n2), jnp.uint32),
            S((n1, n2), jnp.uint32), S((n1, n2), jnp.uint32)]
    _compile(call, args + _tab_avals(tab_np))


def test_inverse_lowers_at_odd_bt():
    """Any explicit bt must produce a legal p/mu block layout (the 3D
    [B, 1, n2] scheme when bt % 8 != 0)."""
    n = 16384
    t = nk.tables(n)
    n1, n2 = t["n1"], t["n2"]
    for bt in (1, 3):
        call, tab_np = nk._inv_call(n, bt, False)
        bsz = 2 * bt
        args = [S((bsz, n1, n2), jnp.uint32), S((bsz, n1, n2), jnp.uint32),
                S((bsz, n2), jnp.uint32), S((bsz, n2), jnp.uint32),
                S((bsz, n2), jnp.uint32),
                S((n1, n2), jnp.uint32), S((n1, n2), jnp.uint32)]
        _compile(call, args + _tab_avals(tab_np))


def test_digits_kernel_lowers():
    n = 16384
    t = nk.tables(n)
    n1, n2 = t["n1"], t["n2"]
    bt, c, w, off = nk._DEFAULT_BT[n], 8, 16, 0
    span = ((off + w * c - 1) >> 5) + 2
    call, tab_np = nk._fwd_digits_call(n, bt, c, w, off, span, False)
    args = [S((bt, span, n // 2), jnp.uint32),
            S((n1, n2), jnp.uint32), S((n1, n2), jnp.uint32)]
    _compile(call, args + _tab_avals(tab_np))


def test_relin_kernels_lower_at_selected_fits():
    """The configs the fit search would hand the KAT must compile: the
    gate config's single-pass kernel and the Prince config's pnum-chunked
    kernel (these are also what the try-compile probes exercise)."""
    assert nk._probe_relin(16384, 8, 16, 16, 4)
    fit = nk.relin_fused_fit_p(32768, 25, 16)
    assert fit is not None
    assert nk._probe_relin_p(32768, fit["bt"], fit["c"], 16,
                             fit["pc"], fit["pc"])
