"""Pointwise CRT/NTT-domain arithmetic and modulus switching.

TPU-native equivalents of cuhe/Base.cu:1036-1138 kernels, vectorised over
[pnum, len] planes.  NTT-domain values are uint32 pairs mod P; CRT-domain
values are uint32 residues mod the per-plane prime.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import modp


# ---- NTT domain (mod P), Base.cu:1036-1075 ----

def ntt_mul(x, y):
    return modp.mul_modp(x, y)


def ntt_add(x, y):
    return modp.add_modp(x, y)


def ntt_mul_nx1(x, scalar):
    """x: pair [pnum, n]; scalar: pair [n] broadcast across planes."""
    return modp.mul_modp(x, (scalar[0][..., None, :], scalar[1][..., None, :]))


def ntt_add_nx1(x, scalar):
    s = (jnp.broadcast_to(scalar[0][..., None, :], x[0].shape),
         jnp.broadcast_to(scalar[1][..., None, :], x[0].shape))
    return modp.add_modp(x, s)


# ---- CRT domain (per-plane mod p_i), Base.cu:1078-1109 ----

def crt_add(x, y, primes):
    """(x + y) mod p_i per plane; x, y uint32 [.., pnum, n], primes [pnum]."""
    p = primes[..., :, None]
    s = x + y  # < 2p < 2^32 for p < 2^31
    return jnp.where(s >= p, s - p, s)


def crt_add_int(x, a: int, primes):
    """Add integer a to coefficient 0 of every plane (crt_add_int kernel)."""
    p = primes
    add0 = (x[..., :, 0] + jnp.uint32(a) % p) % p
    return x.at[..., :, 0].set(add0)


def crt_add_nx1(x, scalar, primes, mus):
    """Ciphertext + plaintext: add scalar poly [n] to every plane mod p_i.

    Matches Base.cu:1101-1109: (a + b) % p where b is an arbitrary uint32
    (plaintext residues are not reduced mod p_i): compute the exact 33-bit
    sum as a pair, then Barrett-reduce.
    """
    p = primes[..., :, None]
    s_lo = x + scalar[..., None, :]
    carry = (s_lo < x).astype(jnp.uint32)
    return modp.mod_u32((s_lo, jnp.broadcast_to(carry, s_lo.shape)), p,
                        (mus[0][..., :, None], mus[1][..., :, None]))


def crt_mul_int(x, a: int, primes, mus):
    """Multiply coefficient 0 of each plane by integer a mod p_i."""
    p = primes
    v = modp.mulmod_u32(x[..., :, 0], jnp.uint32(a), p, mus)
    return x.at[..., :, 0].set(v)


# ---- Modulus switching (Base.cu:1112-1138) ----

def mod_switch(crt, primes, mus, invp_last, mod_msg: int):
    """BGV-style modulus switch dropping the last prime plane.

    crt:       uint32 [pnum, n] residues at level lvl
    primes:    uint32 [pnum] (p_t = primes[pnum-1] is dropped)
    mus:       Barrett pairs for primes
    invp_last: uint32 [pnum-1], inv(p_t mod p_i, p_i)
    Returns uint32 [pnum-1, n].

    Follows the reference exactly: adjust the dropped residue ("dirty") by
    +/- ep*p_t so it becomes divisible by the message modulus (cut primes are
    chosen == 1 mod mod_msg, Operations.cu:71), with the centered branch on
    dirty > (p_t-1)/2; then (x_i - dirty) * p_t^-1 mod p_i per plane.
    """
    pnum = crt.shape[-2]
    dirty = crt[..., pnum - 1, :].astype(jnp.int32)
    pt = primes[pnum - 1].astype(jnp.int32)
    ep = dirty % jnp.int32(mod_msg)
    adj = jnp.where(dirty > (pt - 1) // 2, dirty - ep * pt, dirty + ep * pt)
    dirty = jnp.where(ep != 0, adj, dirty)  # signed, |dirty| < 2^27ish

    x = crt[..., : pnum - 1, :].astype(jnp.int32)
    p = primes[: pnum - 1].astype(jnp.int32)[..., :, None]
    d = dirty[..., None, :]
    # temp = x - dirty made non-negative by adding k*p (k <= ~2^? ) --
    # equivalently compute (x - d) mod p exactly in int32 then lift
    diff = (x - d) % p            # jnp int32 % has sign of divisor (>=0)
    diff = diff.astype(jnp.uint32)
    mu = (mus[0][: pnum - 1][..., :, None], mus[1][: pnum - 1][..., :, None])
    return modp.mulmod_u32(diff, invp_last[..., :, None],
                           primes[: pnum - 1][..., :, None], mu)
