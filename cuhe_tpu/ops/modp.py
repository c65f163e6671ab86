"""Vectorised Z_P arithmetic over uint32 limb pairs, P = 2^64 - 2^32 + 1.

TPU-native replacement for the reference's inline-PTX scalar ops
(cuhe/ModP.h:40-289).  TPUs have no 64-bit integer units, so a Z_P element is
carried as a pair (lo, hi) of uint32 arrays; widening 32x32 multiplies are
synthesised from 16-bit halves on the VPU.  The identities used throughout
(same math as ModP.h, re-derived for limb pairs):

    2^64 ≡ 2^32 - 1   (mod P)
    2^96 ≡ -1         (mod P)

All public ops take/return *canonical* values in [0, P) unless noted.  A
"pair" is a tuple (lo, hi) of equal-shaped uint32 jax arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

P = 0xFFFFFFFF00000001
# plain python ints so kernels (incl. Pallas) embed them as literals
P_LO = 1
P_HI = 0xFFFFFFFF
MASK32 = 0xFFFFFFFF


def u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# host <-> pair conversion helpers (numpy; for tables and tests)
# ---------------------------------------------------------------------------

def pair_from_u64(x: np.ndarray):
    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


def u64_from_pair(lo, hi) -> np.ndarray:
    lo = np.asarray(lo, dtype=np.uint64)
    hi = np.asarray(hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))


# ---------------------------------------------------------------------------
# 64-bit primitive ops on uint32 pairs
# ---------------------------------------------------------------------------

def _carry(s, a):
    """Carry bit of s = a + b computed mod 2^32."""
    return (s < a).astype(jnp.uint32)


def add64(a, b):
    """(a + b) mod 2^64, plus carry-out bit."""
    alo, ahi = a
    blo, bhi = b
    lo = alo + blo
    c0 = _carry(lo, alo)
    hi1 = ahi + bhi
    c1 = _carry(hi1, ahi)
    hi = hi1 + c0
    c2 = _carry(hi, hi1)
    return (lo, hi), c1 | c2


def sub64(a, b):
    """(a - b) mod 2^64, plus borrow-out bit."""
    alo, ahi = a
    blo, bhi = b
    lo = alo - blo
    b0 = (alo < blo).astype(jnp.uint32)
    hi1 = ahi - bhi
    b1 = (ahi < bhi).astype(jnp.uint32)
    hi = hi1 - b0
    b2 = (hi1 < b0).astype(jnp.uint32)
    return (lo, hi), b1 | b2


def mul32(a, b):
    """Full 32x32 -> 64 product as a pair (built from 16-bit halves)."""
    a = u32(a)
    b = u32(b)
    al = a & jnp.uint32(0xFFFF)
    ah = a >> jnp.uint32(16)
    bl = b & jnp.uint32(0xFFFF)
    bh = b >> jnp.uint32(16)
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    cmid = _carry(mid, lh)
    lo = ll + (mid << jnp.uint32(16))
    clo = _carry(lo, ll)
    hi = hh + (mid >> jnp.uint32(16)) + (cmid << jnp.uint32(16)) + clo
    return lo, hi


def mul64(a, b):
    """Full 64x64 -> 128 product as four uint32 words (w0..w3, LE)."""
    alo, ahi = a
    blo, bhi = b
    l00, h00 = mul32(alo, blo)
    l01, h01 = mul32(alo, bhi)
    l10, h10 = mul32(ahi, blo)
    l11, h11 = mul32(ahi, bhi)
    w0 = l00
    # w1 = h00 + l01 + l10
    t = h00 + l01
    c1 = _carry(t, h00)
    w1 = t + l10
    c2 = _carry(w1, t)
    carry1 = c1 + c2
    # w2 = h01 + h10 + l11 + carry1
    s = h01 + h10
    c3 = _carry(s, h01)
    s2 = s + l11
    c4 = _carry(s2, s)
    w2 = s2 + carry1
    c5 = _carry(w2, s2)
    w3 = h11 + c3 + c4 + c5
    return w0, w1, w2, w3


def geq_p(a) -> jnp.ndarray:
    """value(a) >= P, for a < 2^64."""
    lo, hi = a
    return (hi == jnp.uint32(P_HI)) & (lo >= jnp.uint32(P_LO))


def _cond_sub_p(a):
    lo, hi = a
    m = geq_p(a)
    d, _ = sub64(a, (jnp.uint32(P_LO) * jnp.ones_like(lo),
                     jnp.uint32(P_HI) * jnp.ones_like(hi)))
    return (jnp.where(m, d[0], lo), jnp.where(m, d[1], hi))


def _sel(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))


# ---------------------------------------------------------------------------
# mod-P arithmetic (replaces _add_modP / _sub_modP / _mul_modP, ModP.h:231-289)
# ---------------------------------------------------------------------------

def add_modp(a, b):
    """(a + b) mod P for canonical a, b < P."""
    s, c = add64(a, b)
    # carry: a + b - 2^64 ≡ a + b - P - (2^32 - 1)  =>  add back (2^32 - 1)
    s2, _ = add64(s, (jnp.full_like(s[0], MASK32), jnp.zeros_like(s[0])))
    s = _sel(c.astype(bool), s2, s)
    return _cond_sub_p(s)


def sub_modp(a, b):
    """(a - b) mod P for canonical a, b < P."""
    d, bor = sub64(a, b)
    d2, _ = sub64(d, (jnp.full_like(d[0], MASK32), jnp.zeros_like(d[0])))
    return _sel(bor.astype(bool), d2, d)


def reduce128(w0, w1, w2, w3):
    """(w0 + w1*2^32 + w2*2^64 + w3*2^96) mod P, canonical output.

    Uses 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1:  V ≡ lo64 + w2*(2^32-1) - w3.
    Same folds as ModP.h:249-289, expressed over limb pairs.
    """
    lo = (w0, w1)
    # A = w2 * (2^32 - 1) = (w2 << 32) - w2
    nz = (w2 != 0).astype(jnp.uint32)
    a_pair = ((jnp.uint32(0) - w2), w2 - nz)
    s, c = add64(lo, a_pair)
    s2, _ = add64(s, (jnp.full_like(s[0], MASK32), jnp.zeros_like(s[0])))
    s = _sel(c.astype(bool), s2, s)
    # subtract w3
    d, bor = sub64(s, (w3, jnp.uint32(0)))
    d2, _ = sub64(d, (jnp.full_like(d[0], MASK32), jnp.zeros_like(d[0])))
    d = _sel(bor.astype(bool), d2, d)
    return _cond_sub_p(d)


def mul_modp(a, b):
    """(a * b) mod P for a, b < 2^64 (canonical output)."""
    return reduce128(*mul64(a, b))


def neg_modp(a):
    """(-a) mod P for canonical a."""
    z = (jnp.zeros_like(a[0]), jnp.zeros_like(a[0]))
    return sub_modp(z, a)


def pow2_modp_const(k: int) -> tuple[int, int]:
    """Host helper: (2^k mod P) as python (lo, hi)."""
    v = pow(2, k, P)
    return v & 0xFFFFFFFF, v >> 32


# ---------------------------------------------------------------------------
# Barrett reduction of a 64-bit pair by a 32-bit modulus.
# Replaces the reference's reliance on native 64-bit '%' (e.g. Base.cu:874,
# 489, 893) which TPUs do not have.
# ---------------------------------------------------------------------------

def barrett_mu(p: int) -> tuple[int, int]:
    """Host precompute: mu = floor(2^64 / p) as (lo, hi) ints."""
    mu = (1 << 64) // int(p)
    return mu & 0xFFFFFFFF, mu >> 32


def mod_u32(x, p, mu):
    """x mod p for pair x < 2^64, scalar-or-array uint32 p, mu = floor(2^64/p).

    Returns uint32 array.  Classic Barrett: q = mulhi64(x, mu); r = x - q*p;
    r in [0, 3p) then two conditional subtracts.

    p/mu may be scalars or arrays broadcastable against x; all intermediate
    ops broadcast lazily (no ones_like materialization — inside Pallas
    kernels the eager broadcast multiplies measured ~9x the useful work of
    this function, r3 inverse-ablation probe).
    """
    p = u32(p)
    # mu stays small-shaped; the 16-bit splits inside mul64/mul32 run on the
    # tiny arrays and only the actual products broadcast against x
    _, _, q_lo, q_hi = mul64(x, (u32(mu[0]), u32(mu[1])))
    # low 64 bits of q * p  (p is 32-bit)
    l_lo, l_hi = mul32(q_lo, p)
    m_lo, _ = mul32(q_hi, p)
    qp = (l_lo, l_hi + m_lo)
    r, _ = sub64(x, qp)
    # r < 3p < 2^34: up to two subtractions of p
    for _ in range(2):
        ge = (r[1] > 0) | (r[0] >= p)
        lo2 = r[0] - p
        hi2 = r[1] - (r[0] < p).astype(jnp.uint32)
        r = (jnp.where(ge, lo2, r[0]), jnp.where(ge, hi2, r[1]))
    return r[0]


def mulmod_u32(a, b, p, mu):
    """(a * b) mod p for uint32 a, b."""
    return mod_u32(mul32(a, b), p, mu)


# ---------------------------------------------------------------------------
# Limb (de)composition for the MXU matmul path (ntt.py)
# ---------------------------------------------------------------------------

def pair_to_limbs8(pair):
    """uint32 pair -> 8 x uint8-valued arrays (ascending powers of 2^8)."""
    lo, hi = pair
    out = []
    for w in (lo, hi):
        for s in (0, 8, 16, 24):
            out.append((w >> jnp.uint32(s)) & jnp.uint32(0xFF))
    return out  # length 8, each uint32-dtype with values < 256


def u32_to_limbs4(x):
    """uint32 array -> 4 byte limbs."""
    x = u32(x)
    return [(x >> jnp.uint32(s)) & jnp.uint32(0xFF) for s in (0, 8, 16, 24)]


def u32_to_digits5(x):
    """uint32 array -> 5 signed int8 digits d_i with sum d_i 256^i == x.

    Ripple-free offset extraction (see pair_to_digits8): x' = x + 0x80808080
    with carry-out c gives digits (byte_i(x') XOR 0x80) for i < 4 and
    d_4 = c, since sum_{i<4} (b'_i - 128) 256^i + c 2^32 = x exactly.
    Feeds the int8-MXU NTT matmul path.
    """
    x = u32(x)
    off = jnp.uint32(0x80808080)
    xp = x + off
    c = (xp < x).astype(jnp.int8)
    x80 = jnp.uint32(0x80)
    ds = [(((xp >> jnp.uint32(s)) & jnp.uint32(0xFF)) ^ x80).astype(jnp.int8)
          for s in (0, 8, 16, 24)]
    ds.append(c)
    return ds


def pair_to_digits8(pair):
    """Canonical pair (value < P) -> 8 signed int8 digits, exactly.

    Nine digits (pair_to_digits9) are needed for arbitrary u64 values, but a
    canonical residue v < P always has an equivalent representative w in
    {v, v - P} whose balanced base-256 expansion fits 8 signed digits: the
    8-digit balanced range is exactly [-128*(2^64-1)/255, 127*(2^64-1)/255]
    = [-0x8080808080808080, 0x7F7F7F7F7F7F7F7F].  Taking w = v - P exactly
    when v > 0x7F7F7F7F7F7F7F7F keeps positives at the capacity bound and
    negatives >= PosCap + 1 - P = -(NegCap - 2^32 + 1), in range with 2^32
    to spare.  Digits are extracted from w's two's-complement pair; the top
    digit's mod-256 wrap is exact because the true quotient lies in
    [-128, 127].

    One fewer digit than pair_to_digits9 = 1/9 fewer MXU flops in every
    NTT stage matmul over pair inputs.

    Extraction is ripple-free (full ILP, no serial carry chain): adding the
    offset 0x8080...80 (= NegCap) to w's two's-complement pair makes every
    byte b'_i satisfy d_i = b'_i - 128, because sum_i (b'_i - 128) 256^i
    = (w + OFF mod 2^64) - OFF = w exactly — positives (<= PosCap) never
    wrap while negatives always do.  b - 128 as an int8 bit pattern is
    b XOR 0x80.
    """
    lo, hi = pair
    cap = jnp.uint32(0x7F7F7F7F)
    big = (hi > cap) | ((hi == cap) & (lo > cap))
    # w = v - P  (two's complement on the pair); P = (P_LO, P_HI)
    d, _ = sub64(pair, (jnp.full_like(lo, P_LO), jnp.full_like(hi, P_HI)))
    wlo = jnp.where(big, d[0], lo)
    whi = jnp.where(big, d[1], hi)
    # w' = w + 0x8080808080808080 (mod 2^64)
    (wlo, whi), _ = add64((wlo, whi), (jnp.full_like(lo, 0x80808080),
                                       jnp.full_like(hi, 0x80808080)))
    x80 = jnp.uint32(0x80)
    ds = []
    for w in (wlo, whi):
        for s in (0, 8, 16, 24):
            b = (w >> jnp.uint32(s)) & jnp.uint32(0xFF)
            ds.append((b ^ x80).astype(jnp.int8))
    return ds


def pair_to_digits9(pair):
    """uint32 pair (value < 2^64) -> 9 signed int8 digits (top digit 0/1)."""
    lo, hi = pair
    ds = []
    c = jnp.zeros_like(lo, dtype=jnp.int32)
    for w in (lo, hi):
        for s in (0, 8, 16, 24):
            b = ((w >> jnp.uint32(s)) & jnp.uint32(0xFF)).astype(jnp.int32) + c
            ge = (b >= 128).astype(jnp.int32)
            ds.append((b - (ge << 8)).astype(jnp.int8))
            c = ge
    ds.append(c.astype(jnp.int8))
    return ds


def balanced_digits8_np(w: np.ndarray) -> np.ndarray:
    """uint64 numpy array of values < P -> int8 [8, *shape] balanced digits.

    Each value is replaced by a representative == value (mod P) whose
    balanced base-256 expansion fits in 8 signed digits (host precompute for
    twiddle tables; exactness asserted).
    """
    flat = np.asarray(w, dtype=np.uint64).ravel()
    out = np.empty((8, flat.size), dtype=np.int8)
    for idx, v in enumerate(flat.tolist()):
        ok = False
        for rep in (v, v - P):
            r = rep
            digs = []
            for _ in range(8):
                d = ((r + 128) % 256) - 128
                digs.append(d)
                r = (r - d) >> 8
            if r == 0:
                out[:, idx] = digs
                ok = True
                break
        assert ok, f"value {v} not 8-digit balanced-representable"
    return out.reshape((8,) + np.asarray(w).shape)


def combine_limb_sums_signed(ts: list, bound_log2: int = 25):
    """combine_limb_sums for signed int32 byte-position sums T_t.

    Each |T_t| < 2^bound_log2; adds the offset C = 2^bound_log2 to make all
    terms positive, combines, then subtracts sum_t C*2^(8t) mod P.
    """
    c = 1 << bound_log2
    shifted = [(t + jnp.int32(c)).astype(jnp.uint32) for t in ts]
    r = combine_limb_sums(shifted)
    corr = sum(c * (1 << (8 * t)) for t in range(len(ts))) % P
    corr_pair = (jnp.full_like(r[0], jnp.uint32(corr & MASK32)),
                 jnp.full_like(r[1], jnp.uint32(corr >> 32)))
    return sub_modp(r, corr_pair)


def canonicalize(pair):
    """Reduce a lazy value < 2^64 to canonical [0, P) (one cond-subtract)."""
    return _cond_sub_p(pair)


def _combine_offsets(n: int, bound_log2: int):
    """Per-plane offsets C_t with sum_t C_t 2^(8t) == 0 (mod P).

    Base offset 2^bound makes every plane non-negative; the bytes of
    v = -(sum_t 2^(bound+8t)) mod P are absorbed into the first 8 offsets,
    so the recombination needs NO final constant-subtraction pass.
    """
    s0 = sum(1 << (bound_log2 + 8 * t) for t in range(n)) % P
    v = (-s0) % P
    offs = [1 << bound_log2] * n
    for t in range(min(8, n)):
        offs[t] += (v >> (8 * t)) & 0xFF
    # residue above 8 bytes folds into plane 7 (v < 2^64 so v>>56 < 2^8,
    # already consumed); verify exactness
    assert sum(o * (1 << (8 * t)) for t, o in enumerate(offs)) % P == 0
    return offs


def combine_limb_sums_lazy(ts: list, bound_log2: int = 25):
    """sum_t T_t * 2^(8t) mod P for signed int32 planes T_t, |T_t| < 2^bound.

    Returns a LAZY pair (< 2^64, congruent mod P) — feed to mul_modp (which
    accepts any u64 input) or canonicalize().  Cheaper than
    combine_limb_sums_signed: byte positions pack into <= 4 groups of 52-bit
    pairs, then one algebraic fold
        G0 + G1 2^32 + G2 2^64 + G3 2^96  ==  G0 - G2 - G3 + (G1 + G2) 2^32
    (using 2^64 == 2^32 - 1, 2^96 == -1) replaces the 6-word ripple +
    3 reduce128 passes of combine_limb_sums.  The sign offsets are chosen
    so their weighted sum is == 0 mod P (no correction pass), and absent
    groups drop out of the fold at trace time.  Requires bound_log2 <= 27
    and len(ts) <= 16.
    """
    n = len(ts)
    assert n <= 16 and bound_log2 <= 27
    offs = _combine_offsets(n, bound_log2)
    us = [(t + jnp.int32(o)).astype(jnp.uint32)
          for t, o in zip(ts, offs)]              # U_t < 2^(bound+1) + 255
    zero = jnp.zeros_like(us[0])
    ng = (n + 3) // 4
    groups = []
    for g in range(ng):
        acc = (us[4 * g], zero)
        for j in (1, 2, 3):
            i = 4 * g + j
            if i < n:
                u = us[i]
                sh = jnp.uint32(8 * j)
                acc, _ = add64(acc, (u << sh, u >> jnp.uint32(32 - 8 * j)))
        groups.append(acc)  # < 2^(bound+2+24) <= 2^53
    g0 = groups[0]
    g1 = groups[1] if ng > 1 else None
    g2 = groups[2] if ng > 2 else None
    g3 = groups[3] if ng > 3 else None
    if g1 is None:
        return g0  # single group: already a value < 2^53
    # s = G1 + G2 (G2 may be absent)
    if g2 is not None:
        s, _ = add64(g1, g2)                      # < 2^54
    else:
        s = g1
    u = s[0] + s[1]
    cb = _carry(u, s[0])
    # pos = G0 + u*2^32 + cb*(2^32 - 1); wrap corrections never double-carry
    # because the wrapped remainder is < 2^54
    corr = (jnp.full_like(zero, MASK32), zero)
    pos, c1 = add64(g0, (zero, u))
    pos2, _ = add64(pos, corr)
    pos = _sel(c1.astype(bool), pos2, pos)
    pos3, c2 = add64(pos, (cb * jnp.uint32(MASK32), zero))
    pos4, _ = add64(pos3, corr)
    pos = _sel(c2.astype(bool), pos4, pos3)
    # neg = G2 + G3 + s_hi < 2^55
    neg = (s[1], zero)
    if g2 is not None:
        neg, _ = add64(neg, g2)
    if g3 is not None:
        neg, _ = add64(neg, g3)
    # lazy result < 2^64 (the borrow fold is exact mod P)
    d, bor = sub64(pos, neg)
    d2, _ = sub64(d, corr)
    return _sel(bor.astype(bool), d2, d)


def combine_limb_sums(ts: list):
    """Given int32 arrays T_s (s = 0..len-1, each < 2^27) representing
    sum_s T_s * 2^(8 s), return the canonical value mod P as a pair.

    Used to recombine exact MXU limb-product sums after an NTT stage matmul.
    Strategy: pack groups of four byte-positions into 64-bit pairs, ripple the
    groups into a 6-word accumulator, then fold 192 -> 128 -> 64 bits mod P.
    """
    n = len(ts)
    assert n <= 16
    ts = [t.astype(jnp.uint32) for t in ts]
    zero = jnp.zeros_like(ts[0])
    while len(ts) < 16:
        ts.append(zero)
    # group g covers byte positions 4g..4g+3 => value < 2^(27+24) < 2^51
    groups = []
    for g in range(4):
        acc = (ts[4 * g], zero)
        for j in (1, 2, 3):
            t = ts[4 * g + j]
            sh = jnp.uint32(8 * j)
            pairt = (t << sh, t >> jnp.uint32(32 - 8 * j))
            acc, _ = add64(acc, pairt)
        groups.append(acc)
    # total = sum_g groups[g] * 2^(32 g): ripple into 6 words
    w = [zero] * 6
    for g, (glo, ghi) in enumerate(groups):
        s = w[g] + glo
        c = _carry(s, w[g])
        w[g] = s
        s = w[g + 1] + ghi + c          # ghi < 2^19, no double carry w/ c
        c = _carry(s, w[g + 1])
        w[g + 1] = s
        k = g + 2
        while True:
            s = w[k] + c
            c = _carry(s, w[k])
            w[k] = s
            k += 1
            if k >= 6:
                break
        # (loop always terminates at word 5; carries die out quickly)
    # fold words 4,5 : 2^128 ≡ -2^32, 2^160 ≡ -2^64 ≡ -(2^32 - 1)  (mod P)
    # value = low128 + w4*2^128 + w5*2^160
    #       ≡ low128 - w4*2^32 - w5*(2^32 - 1)
    low = reduce128(w[0], w[1], w[2], w[3])
    # t4 = w4 * 2^32 mod P ; w4 < 2^32 so w4*2^32 < 2^64 -> reduce via pair
    t4 = reduce128(zero, w[4], zero, zero)
    nz5 = (w[5] != 0).astype(jnp.uint32)
    t5 = reduce128((jnp.uint32(0) - w[5]), w[5] - nz5, zero, zero)
    r = sub_modp(low, t4)
    r = sub_modp(r, t5)
    return r
