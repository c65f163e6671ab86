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
from ..ops import ntt_kernels as nk
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


def batched_and_relin_modswitch(ctx: Context, lvl: int, mesh: Mesh = None):
    """Build the flagship fused step: (a, b) -> modswitch(relin(a AND b)).

    Operates on batched NTT-domain pairs [batch, pnum, n]; returns the
    CRT-domain result [batch, pnum-1, n] at level lvl+1.  This is the hot
    path of every homomorphic circuit (SURVEY.md section 3.2-3.4) expressed
    as one jittable function so XLA can fuse and schedule it globally --
    the reference needed ~10 kernel launches + stream sync per gate.

    With `mesh` given (and pnum divisible by its crt axis), the mid-step
    ICRT runs through the explicit-collective shard_map path
    (icrt_to_raw_sharded): per-shard multiword partial sums + ONE psum of
    16-bit half-planes + a k*M correction, instead of letting GSPMD gather
    every shard's residue planes for the cross-prime scan.
    """
    pr = ctx.params
    pn = pr.num_crt_prime_lvl(lvl)
    knum = pr.num_eval_key_lvl(lvl)
    w = pr.log_relin
    n = ctx.n
    mod_len = ctx.mod_len
    primes_np = ctx.primes_np[:pn]
    mus_np = (ctx.mus_np[0][:pn], ctx.mus_np[1][:pn])
    m_words, mi_words, bi = ctx._icrt[lvl]
    invp_last = ctx.invp_np[pn - 1, : pn - 1]
    if ctx.ek_ntt is None:
        raise RuntimeError("eval keys not initialised")

    from ..ops import barrett as barrett_ops
    from ..ops import crt as crt_ops

    layout = ctx.ntt_layout
    icrt_sharded = None
    if mesh is not None and pn % mesh.shape["crt"] == 0:
        icrt_sharded = icrt_to_raw_sharded(mesh)

    def step(a_lo, a_hi, b_lo, b_hi, ek_lo, ek_hi,
             u_lo, u_hi, m_lo, m_hi, m_crt_full):
        pj = jnp.asarray(primes_np)
        muj = (jnp.asarray(mus_np[0]), jnp.asarray(mus_np[1]))
        u_ntt = (u_lo[:pn], u_hi[:pn])
        m_ntt = (m_lo[:pn], m_hi[:pn])
        m_crt = m_crt_full[:pn]
        # AND: pointwise multiply in NTT domain (order-agnostic in `layout`)
        prod = modp.mul_modp((a_lo, a_hi), (b_lo, b_hi))
        # n2c with product degree: INTT + Barrett
        full = nk.inv_linear(prod, n, pj, muj, layout=layout)
        red = barrett_ops.barrett_reduce(
            full, mod_len=mod_len, n=n, u_ntt=u_ntt, m_ntt=m_ntt,
            m_crt=m_crt, primes=pj, mus=muj, layout=layout)
        # c2r (ICRT) to extract relinearization digits
        if icrt_sharded is not None:
            raw = icrt_sharded(red, pj, muj[0], muj[1], jnp.asarray(bi),
                               jnp.asarray(mi_words), jnp.asarray(m_words))
        elif nk.use_fused():
            raw = crt_ops.icrt_to_raw_fused(red, primes_np, mus_np, bi,
                                            mi_words, m_words)
        else:
            raw = crt_ops.icrt_to_raw(red, pj, muj, jnp.asarray(bi),
                                      jnp.asarray(mi_words),
                                      jnp.asarray(m_words))
        # relinearize (batch-generic): digit NTTs + eval-key contraction
        r_lo, r_hi = relin_ops.relinearize(raw, ek_lo, ek_hi, w=w, knum=knum,
                                           pnum=pn, n=n, layout=layout)
        # n2c of the relinearized product (Barrett again)
        full2 = nk.inv_linear((r_lo, r_hi), n, pj, muj, layout=layout)
        red2 = barrett_ops.barrett_reduce(
            full2, mod_len=mod_len, n=n, u_ntt=u_ntt, m_ntt=m_ntt,
            m_crt=m_crt, primes=pj, mus=muj, layout=layout)
        # modswitch down one level
        return pw.mod_switch(red2, pj, muj, jnp.asarray(invp_last), pr.mod_msg)

    return step


def icrt_to_raw_sharded(mesh: Mesh):
    """Explicit-collective ICRT over a crt-sharded prime axis.

    Returns a jittable fn(crt, primes, mus_lo, mus_hi, bi, mi_words, m_words)
    matching ops/crt.icrt_to_raw but evaluated with shard_map: each crt shard
    accumulates its local primes' multiword partial sum, then one psum of
    16-bit half-planes + a k*M correction replaces the cross-shard scan that
    GSPMD would otherwise implement by gathering every shard's planes
    (see ops/crt.icrt_psum_combine).  Output is replicated over `crt` and
    sharded over `batch`.
    """
    from jax.experimental.shard_map import shard_map

    from ..ops import crt as crt_ops

    n_crt = mesh.shape["crt"]

    def local(crt, primes, mu_lo, mu_hi, bi, mi_words, m_words):
        part = crt_ops.icrt_to_raw(crt, primes, (mu_lo, mu_hi), bi,
                                   mi_words, m_words)
        return crt_ops.icrt_psum_combine(part, m_words, "crt", n_crt)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("batch", "crt", None), P("crt"), P("crt"), P("crt"),
                  P("crt"), P("crt", None), P(None)),
        out_specs=P("batch", None, None),
        check_rep=False)
    return jax.jit(fn)


def ntt_fwd_sharded(mesh: Mesh, n: int, axis: str = "crt"):
    """One length-n forward NTT sharded ACROSS chips (stage-boundary
    all-to-all), SURVEY.md §7.2 step 9 / §5 "long-context analog".

    The four-step factorization's stage boundary is a transpose; sharding
    the [n1, n2] coefficient matrix turns it into one ICI all-to-all:

      stage 1: columns j2 sharded -> local matmul over j1 (contracted dim
               is local), local twiddle (twiddle rows j2 sharded alike)
      boundary: lax.all_to_all splits k1, concatenates j2 (the transpose)
      stage 2: rows k1 sharded -> local matmul over j2

    Returns a jitted fn(x) : uint32 [..., n//2] -> pair uint32 [..., n2, n1]
    in the stage-2 matrix layout (global element [.., k2, k1] = NTT output
    index k1 + n1*k2), with the k1 axis sharded over `axis`.  Pointwise
    NTT-domain ops are order-agnostic, so circuits can stay in this layout
    and only un-permute at the edges (cf. the reference's ntt_3 transpose,
    Base.cu:417-437, which this design deletes).

    Requires: mesh.shape[axis] divides both n1 and n2.
    """
    from jax.experimental.shard_map import shard_map

    from ..ops import ntt as ntt_ops

    t = ntt_ops.get_tables(n)
    n1, n2 = t.n1, t.n2
    s = mesh.shape[axis]
    if n1 % s or n2 % s:
        raise ValueError(f"shard count {s} must divide n1={n1}, n2={n2}")

    def local(xm, twt_lo, twt_hi):
        # xm: [..., n1h, n2/s] local column block
        xt = jnp.swapaxes(xm, -1, -2)                      # [..., j2_blk, j1h]
        bt = ntt_ops._stage_matmul_u32(xt, t.w1t_half, t.w1t_half_d8)
        c = modp.mul_modp(bt, (twt_lo, twt_hi))            # [..., j2_blk, k1]
        # stage boundary: the transpose IS the collective
        c = tuple(jax.lax.all_to_all(v, axis, split_axis=v.ndim - 1,
                                     concat_axis=v.ndim - 2, tiled=True)
                  for v in c)                              # [..., j2, k1_blk]
        ct = tuple(jnp.swapaxes(v, -1, -2) for v in c)     # [..., k1_blk, j2]
        d = ntt_ops._stage_matmul_pair(ct, t.w2, t.w2_d8)  # [..., k1_blk, k2]
        return (jnp.swapaxes(d[0], -1, -2), jnp.swapaxes(d[1], -1, -2))

    twt = (np.asarray(t.twt[0]), np.asarray(t.twt[1]))     # [j2, k1]

    def call(x):
        xm = x.reshape(x.shape[:-1] + (n1 // 2, n2))
        nd = xm.ndim
        spec_x = P(*([None] * (nd - 1) + [axis]))
        spec_tw = P(axis, None)
        spec_out = P(*([None] * (nd - 1) + [axis]))
        fn = shard_map(local, mesh=mesh,
                       in_specs=(spec_x, spec_tw, spec_tw),
                       out_specs=(spec_out, spec_out), check_rep=False)
        return fn(xm, jnp.asarray(twt[0]), jnp.asarray(twt[1]))

    return jax.jit(call)


def step_table_args(ctx: Context):
    """The device-resident big-table arguments for the flagship step."""
    return (ctx.ek_ntt[0], ctx.ek_ntt[1]) + ctx.barrett_args()


def jit_sharded_step(ctx: Context, lvl: int, mesh: Mesh):
    """jit the flagship step over a (batch, crt) mesh.

    Ciphertext operands shard over (batch, crt); tables (eval keys, Barrett
    planes) are replicated -- or shard their prime axis over "crt" for the
    eval keys, which are the bulk of the memory.
    """
    step = batched_and_relin_modswitch(ctx, lvl, mesh=mesh)
    ct_shard = ciphertext_sharding(mesh)
    ek_shard = NamedSharding(mesh, P(None, "crt", None))
    plane_shard = NamedSharding(mesh, P("crt", None))
    # modswitch drops one prime plane, so the output prime count (pnum-1)
    # need not divide the crt axis; shard batch only and let GSPMD
    # redistribute (the reference's analogue: per-level reallocation).
    out_spec = NamedSharding(mesh, P("batch", None, None))
    return jax.jit(step,
                   in_shardings=(ct_shard,) * 4 + (ek_shard, ek_shard)
                   + (plane_shard,) * 5,
                   out_shardings=out_spec)
