"""Multi-chip execution: device meshes and sharded gate pipelines.

TPU-native replacement for the reference's multi-GPU model (OpenMP thread per
device + ciphertext pinning + cudaMemcpyPeerAsync, cuhe/CuHE.cu:42-45,217-256,
examples/Prince/Prince.cu:194-201).  The two natural parallel axes of the
workload (SURVEY.md section 2.4) become mesh axes:

  batch : independent ciphertexts of a circuit (the reference's
          one-ciphertext-per-GPU task parallelism) -- embarrassingly parallel.
  crt   : the CRT-prime planes of one ciphertext -- NTT, pointwise ops,
          relinearization and modswitch are plane-local; only ICRT reduces
          across planes (GSPMD inserts the collective).

Precomputed tables (twiddles, primes, eval keys) are replicated by GSPMD,
superseding per-device texture binds / peer copies (Base.cu:58-223).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..context import Context
from ..ops import modp, ntt, relin as relin_ops
from ..ops import pointwise as pw


def make_mesh(n_batch: int, n_crt: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size != n_batch * n_crt:
        raise ValueError(f"need {n_batch * n_crt} devices, have {devices.size}")
    return Mesh(devices.reshape(n_batch, n_crt), ("batch", "crt"))


def ciphertext_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched NTT/CRT-domain data [batch, pnum, n]."""
    return NamedSharding(mesh, P("batch", "crt", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batched_and_relin_modswitch(ctx: Context, lvl: int):
    """Build the flagship fused step: (a, b) -> modswitch(relin(a AND b)).

    Operates on batched NTT-domain pairs [batch, pnum, n]; returns the
    CRT-domain result [batch, pnum-1, n] at level lvl+1.  This is the hot
    path of every homomorphic circuit (SURVEY.md section 3.2-3.4) expressed
    as one jittable function so XLA can fuse and schedule it globally --
    the reference needed ~10 kernel launches + stream sync per gate.
    """
    pr = ctx.params
    pn = pr.num_crt_prime_lvl(lvl)
    knum = pr.num_eval_key_lvl(lvl)
    w = pr.log_relin
    n = ctx.n
    mod_len = ctx.mod_len
    pj = ctx.j_primes[:pn]
    muj = (ctx.j_mus[0][:pn], ctx.j_mus[1][:pn])
    m_words, mi_words, bi = ctx.j_icrt[lvl]
    u_ntt = (ctx.j_u_ntt[0][:pn], ctx.j_u_ntt[1][:pn])
    m_ntt = (ctx.j_m_ntt[0][:pn], ctx.j_m_ntt[1][:pn])
    m_crt = ctx.j_m_crt[:pn]
    invp_last = ctx.j_invp[pn - 1, : pn - 1]
    if ctx.ek_ntt is None:
        raise RuntimeError("eval keys not initialised")
    ek_lo, ek_hi = ctx.ek_ntt

    from ..ops import barrett as barrett_ops
    from ..ops import crt as crt_ops

    def step(a_lo, a_hi, b_lo, b_hi):
        p_col = pj[:, None]
        mu_col = (muj[0][:, None], muj[1][:, None])
        # AND: pointwise multiply in NTT domain
        prod = modp.mul_modp((a_lo, a_hi), (b_lo, b_hi))
        # n2c with product degree: INTT + Barrett
        full = ntt.intt_modcrt(prod, n, p_col, mu_col)
        red = barrett_ops.barrett_reduce(
            full, mod_len=mod_len, n=n, u_ntt=u_ntt, m_ntt=m_ntt,
            m_crt=m_crt, primes=pj, mus=muj)
        # c2r (ICRT) to extract relinearization digits
        raw = crt_ops.icrt_to_raw(red, pj, muj, bi, mi_words, m_words)
        # relinearize (batch-generic): digit NTTs + eval-key contraction
        r_lo, r_hi = relin_ops.relinearize(raw, ek_lo, ek_hi,
                                           w=w, knum=knum, pnum=pn, n=n)
        # n2c of the relinearized product (Barrett again)
        full2 = ntt.intt_modcrt((r_lo, r_hi), n, p_col, mu_col)
        red2 = barrett_ops.barrett_reduce(
            full2, mod_len=mod_len, n=n, u_ntt=u_ntt, m_ntt=m_ntt,
            m_crt=m_crt, primes=pj, mus=muj)
        # modswitch down one level
        return pw.mod_switch(red2, pj, muj, invp_last, pr.mod_msg)

    return step


def jit_sharded_step(ctx: Context, lvl: int, mesh: Mesh):
    """jit the flagship step over a (batch, crt) mesh."""
    step = batched_and_relin_modswitch(ctx, lvl)
    ct_shard = ciphertext_sharding(mesh)
    out_spec = NamedSharding(mesh, P("batch", "crt", None))
    return jax.jit(step,
                   in_shardings=(ct_shard,) * 4,
                   out_shardings=out_spec)
