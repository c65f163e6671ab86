"""NTT over Z_P as MXU matmuls (four-step algorithm).

TPU-native redesign of the reference's 3-stage 64x64xK radix-8 CUDA kernels
(cuhe/Base.cu:309-842).  Instead of butterfly networks with shared-memory
transposes, the length-N transform is factored N = N1 * N2 and evaluated as

    stage 1:  B[k1, j2] = sum_j1 X[j1, j2] * w^(N2*j1*k1)     (matmul)
    twiddle:  C[k1, j2] = B[k1, j2] * w^(k1*j2)               (elementwise)
    stage 2:  D[k1, k2] = sum_j2 C[k1, j2] * w^(N1*j2*k2)     (matmul)
    output:   out[k1 + N1*k2] = D[k1, k2]

which is bit-identical to the DFT out[k] = sum_j x[j] w^(j k) checked by the
reference oracle (tests/test_ntt.cu:38-64), with the same generator
g = 15893793146607301539 and w = g^(65536/N) (Base.cu:64-67).

Z_P matmuls are made exact on the MXU by decomposing both operands into 8-bit
limbs lifted to bfloat16: every f32 partial sum is bounded by
256 * 255^2 < 2^24 so accumulation is exact; limb-product sums are then
recombined mod P on the VPU (ops/modp.py).  Forward-transform inputs are
uint32 residues (4 limbs); the reference's zero-padded upper half
(ntt_1_*_ext, Base.cu:309) becomes simply a halved inner dimension.

The windowed-digit forward NTT used by relinearization
(ntt_1_*_ext_block, Base.cu:345-385) is `ntt_from_digit`, which extracts a
w-bit window of the RAW multiword coefficients before the same pipeline.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import hostmath as hm
from . import modp

P = hm.P

_FACTORS = {16384: (128, 128), 32768: (128, 256), 65536: (256, 256)}


def _pow_table(omega: int, n: int) -> np.ndarray:
    pw = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        pw[i] = cur
        cur = cur * omega % P
    return pw


def _limbs8_f32(w: np.ndarray) -> np.ndarray:
    """uint64 matrix -> f32 limb stack [8, *w.shape] (numpy, exact bytes).

    Kept as numpy so tables are trace-free; converted to bf16 constants at
    use sites (byte values 0..255 are exact in bf16).
    """
    limbs = [((w >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.float32)
             for i in range(8)]
    return np.stack(limbs)


class NttTables:
    """Precomputed twiddle-limb matrices for one transform length.

    Replaces preload_ntt (Base.cu:58-108); tables are replicated to all chips
    by GSPMD instead of per-device texture binds.
    """

    def __init__(self, n: int):
        if n not in _FACTORS:
            raise ValueError(f"unsupported NTT length {n}")
        self.n = n
        n1, n2 = _FACTORS[n]
        self.n1, self.n2 = n1, n2
        omega = pow(hm.NTT_GEN, 65536 // n, P)
        omega_inv = hm.modinv(omega, P)

        def build(om):
            pw = _pow_table(om, n)
            k1 = np.arange(n1, dtype=np.int64)
            j1 = np.arange(n1, dtype=np.int64)
            j2 = np.arange(n2, dtype=np.int64)
            k2 = np.arange(n2, dtype=np.int64)
            # W1T[j1, k1] = om^(N2 * j1 * k1)
            w1t = pw[(np.outer(j1, k1) % n1) * n2 % n]
            # TwT[j2, k1] = om^(k1 * j2)  (transposed layout: stage-1 output
            # is kept as [..., j2, k1])
            twt = pw[np.outer(j2, k1) % n]
            # W2[j2, k2] = om^(N1 * j2 * k2)
            w2 = pw[(np.outer(j2, k2) % n2) * n1 % n]
            return w1t, twt, w2

        def np_pair(w):
            return ((w & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                    (w >> np.uint64(32)).astype(np.uint32))

        w1t, twt, w2 = build(omega)
        self.w1t_half = _limbs8_f32(w1t[: n1 // 2])  # zero-padded upper half
        self.w1t_full = _limbs8_f32(w1t)
        self.twt = np_pair(twt)
        self.w2 = _limbs8_f32(w2)
        self.w1t_half_d8 = modp.balanced_digits8_np(w1t[: n1 // 2])
        self.w1t_full_d8 = modp.balanced_digits8_np(w1t)
        self.w2_d8 = modp.balanced_digits8_np(w2)

        w1t_i, twt_i, w2_i = build(omega_inv)
        self.w1t_inv = _limbs8_f32(w1t_i)
        self.twt_inv = np_pair(twt_i)
        self.w2_inv = _limbs8_f32(w2_i)
        self.w1t_inv_d8 = modp.balanced_digits8_np(w1t_i)
        self.w2_inv_d8 = modp.balanced_digits8_np(w2_i)

        ninv = hm.modinv(n, P)
        self.ninv = (ninv & 0xFFFFFFFF, ninv >> 32)



@lru_cache(maxsize=None)
def get_tables(n: int) -> NttTables:
    return NttTables(n)


# ---------------------------------------------------------------------------
# exact modular matmul on the MXU
# ---------------------------------------------------------------------------

def _const_pair(np_pair):
    return (jnp.asarray(np_pair[0]), jnp.asarray(np_pair[1]))


def _matmul_modp(x_limbs: list, w_limbs) -> tuple:
    """sum_j X[..., m, j] * W[j, n] mod P.

    x_limbs: list of uint32 arrays [..., m, j] with byte values (LSB first).
    w_limbs: f32 numpy [Lw, j, n] byte limbs of the twiddle matrix (embedded
    as bf16 constants at trace time).
    Returns a canonical pair [..., m, n].
    """
    w_limbs = jnp.asarray(w_limbs, dtype=jnp.bfloat16)
    lw = w_limbs.shape[0]
    xl = jnp.stack([l.astype(jnp.bfloat16) for l in x_limbs], axis=-3)
    # S[..., a, l, m, n] exact in f32: bound 256 * 255^2 < 2^24
    s = jnp.einsum("...amj,ljn->...almn", xl, w_limbs,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    la = len(x_limbs)
    ts = []
    for tot in range(la + lw - 1):
        acc = None
        for a in range(max(0, tot - lw + 1), min(la, tot + 1)):
            term = s[..., a, tot - a, :, :]
            acc = term if acc is None else acc + term
        ts.append(acc)
    return modp.combine_limb_sums(ts)


def _matmul_modp_i8(x_digits: list, wdig) -> tuple:
    """sum_j X[..., m, j] * W[j, n] mod P via one banded int8 MXU matmul.

    x_digits: signed int8 digit arrays [..., m, j] (ascending powers of 256,
    from modp.u32_to_digits5 / pair_to_digits9).  wdig: int8 numpy [8, j, n]
    balanced digits of the twiddle matrix (modp.balanced_digits8_np).

    Instead of materializing the [la, 8, m, n] limb-product tensor and
    summing diagonals (``_matmul_modp``), the digit axes are banded into a
    single contraction: X digits concatenated along j, W digits stacked into
    a block-banded [la*j, T, n] tensor so the einsum directly yields the
    byte-position sums T_t.  int8 x int8 -> int32 accumulation is exact at
    any depth (products <= 2^14, |T_t| < 8*j*2^14 <= 2^25), and runs the MXU
    at its double-rate int8 path.
    """
    la = len(x_digits)
    lw = wdig.shape[0]
    t_cnt = la + lw - 1
    wd = jnp.asarray(wdig)                       # [8, j, n] int8
    wjt = jnp.swapaxes(wd, 0, 1)                 # [j, 8, n]
    blocks = [jnp.pad(wjt, ((0, 0), (a, t_cnt - lw - a), (0, 0)))
              for a in range(la)]
    wband = jnp.concatenate(blocks, axis=0)      # [la*j, T, n]
    xcat = jnp.concatenate(x_digits, axis=-1)    # [..., m, la*j]
    s = jnp.einsum("...mk,ktn->...tmn", xcat, wband,
                   preferred_element_type=jnp.int32)
    ts = [s[..., t, :, :] for t in range(t_cnt)]
    return modp.combine_limb_sums_signed(ts, bound_log2=26)


import os as _os

# Read once at import: Context caches jitted transforms at construction, so a
# trace-time env read would silently ignore later flips (ADVICE.md r1).  Use
# set_i8_path() to change it explicitly BEFORE building new jits.
_I8_PATH = _os.environ.get("CUHE_NTT_I8", "1") == "1"


def set_i8_path(enabled: bool) -> None:
    """Select the int8-banded (True) or bf16-limb (False) stage matmul path.

    Takes effect for traces performed after the call; already-jitted
    functions (e.g. a Context's cached transforms) keep their path.
    """
    global _I8_PATH
    _I8_PATH = bool(enabled)


def _use_i8() -> bool:
    return _I8_PATH


def _stage_matmul_u32(x, w_f32, w_d8):
    """Dispatch one NTT stage matmul for uint32 input by configured path."""
    if _use_i8():
        return _matmul_modp_i8(modp.u32_to_digits5(x), w_d8)
    return _matmul_modp(modp.u32_to_limbs4(x), w_f32)


def _stage_matmul_pair(x_pair, w_f32, w_d8):
    """Dispatch one NTT stage matmul for pair input by configured path."""
    if _use_i8():
        return _matmul_modp_i8(modp.pair_to_digits9(x_pair), w_d8)
    return _matmul_modp(modp.pair_to_limbs8(x_pair), w_f32)


# ---------------------------------------------------------------------------
# forward / inverse transforms
# ---------------------------------------------------------------------------

def ntt_fwd_u32(x: jnp.ndarray, n: int):
    """Forward length-n NTT of uint32 input of length n/2 (upper half zero).

    x: uint32 [..., n/2]  ->  pair of uint32 [..., n], canonical mod P.
    Mirrors ntt_1_*_ext -> ntt_2_* -> ntt_3_* (Base.cu:309-437).
    """
    t = get_tables(n)
    n1, n2 = t.n1, t.n2
    xm = x.reshape(x.shape[:-1] + (n1 // 2, n2))
    xt = jnp.swapaxes(xm, -1, -2)  # [..., j2, j1]
    bt = _stage_matmul_u32(xt, t.w1t_half, t.w1t_half_d8)  # [..., j2, k1]
    c = modp.mul_modp(bt, _const_pair(t.twt))
    ct = (jnp.swapaxes(c[0], -1, -2), jnp.swapaxes(c[1], -1, -2))  # [..., k1, j2]
    d = _stage_matmul_pair(ct, t.w2, t.w2_d8)  # [..., k1, k2]
    out = (jnp.swapaxes(d[0], -1, -2).reshape(x.shape[:-1] + (n,)),
           jnp.swapaxes(d[1], -1, -2).reshape(x.shape[:-1] + (n,)))
    return out


def ntt_fwd_pair(x_pair, n: int):
    """Forward length-n NTT of a full-length pair input (rarely needed)."""
    t = get_tables(n)
    n1, n2 = t.n1, t.n2
    lo, hi = x_pair
    shape = lo.shape[:-1]
    xm = (lo.reshape(shape + (n1, n2)), hi.reshape(shape + (n1, n2)))
    xt = (jnp.swapaxes(xm[0], -1, -2), jnp.swapaxes(xm[1], -1, -2))
    bt = _stage_matmul_pair(xt, t.w1t_full, t.w1t_full_d8)
    c = modp.mul_modp(bt, _const_pair(t.twt))
    ct = (jnp.swapaxes(c[0], -1, -2), jnp.swapaxes(c[1], -1, -2))
    d = _stage_matmul_pair(ct, t.w2, t.w2_d8)
    return (jnp.swapaxes(d[0], -1, -2).reshape(shape + (n,)),
            jnp.swapaxes(d[1], -1, -2).reshape(shape + (n,)))


def intt_raw(x_pair, n: int):
    """Unscaled inverse: sum_k X[k] w^(-k t), as a canonical pair [..., n]."""
    t = get_tables(n)
    n1, n2 = t.n1, t.n2
    lo, hi = x_pair
    shape = lo.shape[:-1]
    xm = (lo.reshape(shape + (n1, n2)), hi.reshape(shape + (n1, n2)))
    xt = (jnp.swapaxes(xm[0], -1, -2), jnp.swapaxes(xm[1], -1, -2))
    bt = _stage_matmul_pair(xt, t.w1t_inv, t.w1t_inv_d8)
    c = modp.mul_modp(bt, _const_pair(t.twt_inv))
    ct = (jnp.swapaxes(c[0], -1, -2), jnp.swapaxes(c[1], -1, -2))
    d = _stage_matmul_pair(ct, t.w2_inv, t.w2_inv_d8)
    return (jnp.swapaxes(d[0], -1, -2).reshape(shape + (n,)),
            jnp.swapaxes(d[1], -1, -2).reshape(shape + (n,)))


def intt_modcrt(x_pair, n: int, p, mu, chunk: int = 8):
    """Full inverse NTT with per-plane CRT reduction.

    Equivalent to intt_1 -> ntt_2 -> intt_3_modcrt (Base.cu:438-490): scales
    by n^-1 mod P then reduces each value mod the (broadcasted) prime p.
    p: uint32 array broadcastable against [..., n]; mu: matching Barrett pair.
    Returns uint32 [..., n].

    Internally chunks over the total number of transforms so the limb-product
    intermediates stay bounded regardless of batch shape.
    """
    t = get_tables(n)
    lo, hi = x_pair
    shape = lo.shape

    def finish(y, pc, muc):
        ninv = (jnp.full(y[0].shape, t.ninv[0], jnp.uint32),
                jnp.full(y[0].shape, t.ninv[1], jnp.uint32))
        y = modp.mul_modp(y, ninv)
        return modp.mod_u32(y, pc, muc)

    # broadcast the prime/mu against the batch, then flatten transforms
    p_b = jnp.broadcast_to(p, shape[:-1] + (1,)).reshape(-1, 1)
    mu_b = (jnp.broadcast_to(mu[0], shape[:-1] + (1,)).reshape(-1, 1),
            jnp.broadcast_to(mu[1], shape[:-1] + (1,)).reshape(-1, 1))
    flat = (lo.reshape(-1, n), hi.reshape(-1, n))
    b = flat[0].shape[0]
    if b <= chunk:
        out = finish(intt_raw(flat, n), p_b, mu_b)
        return out.reshape(shape)
    pad = (-b) % chunk
    padded = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in flat)
    pc = jnp.pad(p_b, ((0, pad), (0, 0)), constant_values=1)
    mc = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in mu_b)
    nchunks = (b + pad) // chunk
    xs = (padded[0].reshape(nchunks, chunk, n),
          padded[1].reshape(nchunks, chunk, n),
          pc.reshape(nchunks, chunk, 1),
          mc[0].reshape(nchunks, chunk, 1), mc[1].reshape(nchunks, chunk, 1))
    out = jax.lax.map(
        lambda v: finish(intt_raw((v[0], v[1]), n), v[2], (v[3], v[4])), xs)
    return out.reshape(-1, n)[:b].reshape(shape)


def extract_digit(raw: jnp.ndarray, w: int, wid: int, w32: int) -> jnp.ndarray:
    """w-bit window `wid` of planar RAW coefficients [w32, len] -> uint32 [len].

    Matches the in-kernel windowing of ntt_1_*_ext_block (Base.cu:360-371).
    """
    bit = w * wid
    k = bit >> 5
    sh = jnp.uint32(bit & 31)
    lo = raw[..., k, :]
    hi = raw[..., k + 1, :] if k + 1 < w32 else jnp.zeros_like(lo)
    mask = jnp.uint32((1 << w) - 1) if w < 32 else jnp.uint32(0xFFFFFFFF)
    val = (lo >> sh) | jnp.where(sh == 0, jnp.uint32(0), hi << (jnp.uint32(32) - sh))
    return val & mask


def ntt_from_digit(raw: jnp.ndarray, w: int, wid: int, n: int):
    """Forward NTT of one relinearization digit straight from RAW words."""
    w32 = raw.shape[-2]
    digit = extract_digit(raw, w, wid, w32)
    return ntt_fwd_u32(digit, n)


def ntt_fwd_batched(x: jnp.ndarray, n: int, chunk: int = 8):
    """Memory-bounded batched forward NTT over the leading axis via lax.map.

    This is the XLA reference path; the fused TPU kernels live in
    ops/ntt_kernels.py (v2) and are dispatched by ntt_kernels.fwd_linear.
    """
    shape = x.shape
    flat = x.reshape((-1, shape[-1]))  # chunk over TOTAL transforms
    b = flat.shape[0]
    if b <= chunk:
        lo, hi = ntt_fwd_u32(flat, n)
    else:
        pad = (-b) % chunk
        xp = jnp.pad(flat, ((0, pad), (0, 0)))
        xc = xp.reshape((xp.shape[0] // chunk, chunk, shape[-1]))
        lo, hi = jax.lax.map(lambda v: ntt_fwd_u32(v, n), xc)
        lo = lo.reshape(-1, n)[:b]
        hi = hi.reshape(-1, n)[:b]
    return lo.reshape(shape[:-1] + (n,)), hi.reshape(shape[:-1] + (n,))
