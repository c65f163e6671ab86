"""Checked-mode helpers (the reference's Debug.h CSC/CCE + `#define safer`).

The reference wraps every CUDA call in CSC()/CCE() macros and optionally
synchronises after each launch (cuhe/Debug.h:35-64).  Under XLA those failure
modes do not exist; what can go wrong here is *value-domain* corruption
(non-canonical mod-P pairs, residues >= p).  Enable CUHE_SAFER=1 to make the
helpers below raise on violation; they are no-ops otherwise so the hot path
stays clean.
"""

from __future__ import annotations

import os

import numpy as np

SAFER = os.environ.get("CUHE_SAFER", "0") == "1"

P = 0xFFFFFFFF00000001


def check_canonical_pair(lo, hi, what: str = "value") -> None:
    """Assert a uint32 pair is a canonical Z_P element (< P)."""
    if not SAFER:
        return
    v = np.asarray(lo, dtype=np.uint64) | (np.asarray(hi, dtype=np.uint64) << np.uint64(32))
    if (v >= P).any():
        bad = int(v.max())
        raise AssertionError(f"{what}: non-canonical mod-P value {bad:#x}")


def check_residues(x, primes, what: str = "crt") -> None:
    """Assert CRT planes hold residues < p_i."""
    if not SAFER:
        return
    arr = np.asarray(x)
    ps = np.asarray(primes).reshape(-1, *([1] * (arr.ndim - 2)), 1)
    if (arr >= ps).any():
        raise AssertionError(f"{what}: residue >= prime")
