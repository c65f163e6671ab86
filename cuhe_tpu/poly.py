"""Ciphertext / plaintext polynomial objects and gate-level operations.

Functional TPU-native equivalent of the reference's CuPolynomial / CuCtxt /
CuPtxt state machine and gate API (cuhe/CuHE.h:46-209, cuhe/CuHE.cu:80-606).

A polynomial carries its circuit level, current domain and "is product"
degree flag, exactly like the reference, but is immutable: every conversion
or gate returns a new object.  Representations:

  ZZX : host Python ints (list), coefficients in [0, q)
  RAW : uint32 [words, raw_len]    (planar little-endian words)
  CRT : uint32 [pnum, crt_len]
  NTT : pair of uint32 [pnum, ntt_len]

Device placement / moveTo / copyTo (CuHE.cu:217-256) are deleted by design:
under GSPMD a ciphertext's placement is its NamedSharding, see parallel/.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from . import hostmath as hm
from .context import Context
from .ops import pointwise as pw

ZZX, RAW, CRT, NTT = "zzx", "raw", "crt", "ntt"


@dataclasses.dataclass(frozen=True)
class Ctxt:
    """Ciphertext polynomial (CuCtxt, CuHE.h:115-138)."""

    level: int
    domain: str
    data: Any
    is_prod: bool = False

    def logq(self, ctx: Context) -> int:
        return ctx.params.log_coeff(self.level)


@dataclasses.dataclass(frozen=True)
class Ptxt:
    """Plaintext polynomial: single residue plane (CuPtxt, CuHE.h:141-147)."""

    domain: str
    data: Any


# ---------------------------------------------------------------------------
# constructors / host bridges
# ---------------------------------------------------------------------------

def ctxt_from_ints(coeffs: list[int], level: int) -> Ctxt:
    return Ctxt(level=level, domain=ZZX, data=[int(c) for c in coeffs])


def ptxt_from_ints(coeffs: list[int]) -> Ptxt:
    return Ptxt(domain=ZZX, data=[int(c) for c in coeffs])


def to_ints(ctx: Context, ct: Ctxt) -> list[int]:
    """x2z (CuHE.cu:411-425): convert to host coefficients."""
    ct = to_raw(ctx, ct)
    if ct.domain == ZZX:
        return list(ct.data)
    import numpy as np

    arr = np.asarray(ct.data)
    return hm.words_to_ints(arr)[: ctx.params.mod_len]


# ---------------------------------------------------------------------------
# domain conversions (CuPolynomial::x2r / x2c / x2n / x2z)
# ---------------------------------------------------------------------------

def _z2r(ctx: Context, ct: Ctxt) -> Ctxt:
    words = ctx.params.words_coeff(ct.level)
    raw = jnp.asarray(hm.ints_to_words(ct.data, words, ctx.params.raw_len))
    return dataclasses.replace(ct, domain=RAW, data=raw)


def to_raw(ctx: Context, ct: Ctxt) -> Ctxt:
    if ct.domain == RAW:
        return ct
    if ct.domain == ZZX:
        return _z2r(ctx, ct)
    if ct.domain == NTT:
        return to_raw(ctx, to_crt(ctx, ct))
    # CRT -> RAW (c2r): ICRT unless single-prime passthrough (CuHE.cu:366-382)
    if ctx.params.log_coeff(ct.level) > ctx.params.log_crt_prime:
        raw = ctx._jit_c2r(ct.level)(ct.data)
    else:
        raw = ct.data
    return dataclasses.replace(ct, domain=RAW, data=raw)


def to_crt(ctx: Context, ct: Ctxt) -> Ctxt:
    if ct.domain == CRT:
        return ct
    if ct.domain == ZZX:
        return to_crt(ctx, _z2r(ctx, ct))
    if ct.domain == RAW:
        if ctx.params.log_coeff(ct.level) > ctx.params.log_crt_prime:
            c = ctx._jit_r2c(ct.level)(ct.data)
        else:
            c = ct.data
        return dataclasses.replace(ct, domain=CRT, data=c)
    # NTT -> CRT (n2c): INTT, with Barrett reduction if a product
    c = ctx._jit_n2c(ct.level, ct.is_prod)(ct.data)
    return dataclasses.replace(ct, domain=CRT, data=c, is_prod=False)


def to_ntt(ctx: Context, ct: Ctxt) -> Ctxt:
    if ct.domain == NTT:
        return ct
    ct = to_crt(ctx, ct)
    pair = ctx._jit_c2n(ct.level)(ct.data)
    return dataclasses.replace(ct, domain=NTT, data=pair)


def ptxt_to_ntt(ctx: Context, pt: Ptxt) -> Ptxt:
    if pt.domain == NTT:
        return pt
    if pt.domain == ZZX:
        raw = jnp.asarray(hm.ints_to_words(pt.data, 1, ctx.params.raw_len))
        pt = Ptxt(domain=CRT, data=raw)
    pair = ctx._jit_c2n(-1)(pt.data)
    return Ptxt(domain=NTT, data=pair)


def ptxt_to_crt(ctx: Context, pt: Ptxt) -> Ptxt:
    if pt.domain == CRT:
        return pt
    if pt.domain == ZZX:
        raw = jnp.asarray(hm.ints_to_words(pt.data, 1, ctx.params.raw_len))
        return Ptxt(domain=CRT, data=raw)
    raise ValueError("cannot convert plaintext NTT -> CRT")


# ---------------------------------------------------------------------------
# gates (CuHE.cu:101-216)
# ---------------------------------------------------------------------------

def _check(a: Ctxt, b: Ctxt, dom: str | None):
    if a.level != b.level:
        raise ValueError("operands at different levels")
    if dom is not None and (a.domain != dom or b.domain != dom):
        raise ValueError(f"operands must be in {dom} domain")


def c_and(ctx: Context, a: Ctxt, b: Ctxt) -> Ctxt:
    """Homomorphic AND = NTT-domain pointwise multiply (cAnd, CuHE.cu:101)."""
    _check(a, b, NTT)
    out = pw.ntt_mul(a.data, b.data)
    return Ctxt(level=a.level, domain=NTT, data=out, is_prod=True)


def c_and_ptxt(ctx: Context, a: Ctxt, pt: Ptxt) -> Ctxt:
    if a.domain != NTT or pt.domain != NTT:
        raise ValueError("cAnd(ct, pt) requires NTT domain")
    out = pw.ntt_mul_nx1(a.data, (pt.data[0][0], pt.data[1][0]))
    return Ctxt(level=a.level, domain=NTT, data=out, is_prod=True)


def c_xor(ctx: Context, a: Ctxt, b: Ctxt) -> Ctxt:
    """Homomorphic XOR = addition (cXor, CuHE.cu:141)."""
    _check(a, b, None)
    if a.domain == CRT and b.domain == CRT:
        pn = ctx.params.num_crt_prime_lvl(a.level)
        out = pw.crt_add(a.data, b.data, ctx.primes[:pn])
        return Ctxt(level=a.level, domain=CRT, data=out)
    if a.domain == NTT and b.domain == NTT:
        out = pw.ntt_add(a.data, b.data)
        return Ctxt(level=a.level, domain=NTT, data=out,
                    is_prod=a.is_prod or b.is_prod)
    raise ValueError("cXor requires both operands in CRT or NTT domain")


def c_xor_ptxt(ctx: Context, a: Ctxt, pt: Ptxt) -> Ctxt:
    pn = ctx.params.num_crt_prime_lvl(a.level)
    if a.domain == CRT and pt.domain == CRT:
        mus = ctx.mus()
        out = pw.crt_add_nx1(a.data, pt.data[0], ctx.primes[:pn],
                             (mus[0][:pn], mus[1][:pn]))
        return Ctxt(level=a.level, domain=CRT, data=out)
    if a.domain == NTT and pt.domain == NTT:
        out = pw.ntt_add_nx1(a.data, (pt.data[0][0], pt.data[1][0]))
        return Ctxt(level=a.level, domain=NTT, data=out, is_prod=a.is_prod)
    raise ValueError("cXor(ct, pt) domain mismatch")


def c_not(ctx: Context, a: Ctxt) -> Ctxt:
    """Homomorphic NOT: add (mod_msg - 1) to constant coeff (cNot, CuHE.cu:203)."""
    if a.domain != CRT:
        raise ValueError("cNot requires CRT domain")
    pn = ctx.params.num_crt_prime_lvl(a.level)
    out = pw.crt_add_int(a.data, ctx.params.mod_msg - 1, ctx.primes[:pn])
    return Ctxt(level=a.level, domain=CRT, data=out)


# ---------------------------------------------------------------------------
# noise control (CuCtxt::modSwitch / relin, CuHE.cu:543-581)
# ---------------------------------------------------------------------------

def mod_switch(ctx: Context, ct: Ctxt) -> Ctxt:
    pr = ctx.params
    if pr.log_coeff(ct.level) < pr.log_coeff_min + pr.log_coeff_cut:
        raise ValueError("cannot modSwitch on the last level")
    ct = to_crt(ctx, ct)
    out = ctx._jit_mod_switch(ct.level)(ct.data)
    return Ctxt(level=ct.level + 1, domain=CRT, data=out)


def mod_switch_to(ctx: Context, ct: Ctxt, lvl: int) -> Ctxt:
    if lvl < ct.level or lvl >= ctx.params.depth:
        raise ValueError("modSwitch to unavailable level")
    while ct.level < lvl:
        ct = mod_switch(ctx, ct)
    return ct


def relin(ctx: Context, ct: Ctxt) -> Ctxt:
    """Key switch back to a linear ciphertext (CuCtxt::relin, CuHE.cu:570)."""
    ct = to_raw(ctx, ct)
    pair = ctx._jit_relin(ct.level)(ct.data)
    out = Ctxt(level=ct.level, domain=NTT, data=pair, is_prod=True)
    return to_crt(ctx, out)


# ---------------------------------------------------------------------------
# NTL-interface equivalent (mulZZX, CuHE.cu:259-268)
# ---------------------------------------------------------------------------

def poly_mul_ints(ctx: Context, a: list[int], b: list[int], lvl: int) -> list[int]:
    """(a * b) mod m(x), coefficients mod q_lvl; both inputs already in [0, q).

    Routed through the batched one-to-many pipeline so keygen's single
    pk = g*f^-1 product (DHS.cu:330) shares ONE jitted program with
    genEk/encrypt/decrypt instead of compiling its own — compiles through
    the axon tunnel cost ~8 min each and the persistent cache does not hit
    across processes (r4 setup profile).
    """
    return poly_mul_one_to_many(ctx, a, [b], lvl)[0]


def poly_mul_one_to_many(ctx: Context, a: list[int], bs: list[list[int]],
                         lvl: int, chunk: int = 4) -> list[list[int]]:
    """Batched (a * b_i) mod m(x) mod q for a fixed left operand.

    Keygen generates num_eval_key products against the same pk (genEk,
    DHS.cu:340-362); batching them through one jitted chunk pipeline
    amortises both compilation and the NTT of `a`.
    """
    import numpy as np

    pr = ctx.params
    words = pr.words_coeff(lvl)
    a_ntt = to_ntt(ctx, ctxt_from_ints(a, lvl)).data

    fn = ctx._jit_mul_one_many(lvl, chunk)
    raws = [hm.ints_to_words(b, words, pr.raw_len) for b in bs]
    out = []
    for i in range(0, len(raws), chunk):
        batch = raws[i: i + chunk]
        npad = chunk - len(batch)
        batch = batch + [np.zeros_like(batch[0])] * npad
        res = np.asarray(fn(jnp.asarray(np.stack(batch)), a_ntt))
        for j in range(len(batch) - npad):
            out.append(hm.words_to_ints(res[j])[: pr.mod_len])
    return out
