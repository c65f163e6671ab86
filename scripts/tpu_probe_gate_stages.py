"""Per-stage attribution of the fused gate step (AND+relin+modswitch).

The reference attributes per-kernel time with cudaEvents around each launch
(tests/test_ntt.cu:67-100).  Through the axon tunnel, per-call timing is
swamped by the ~25 ms dispatch constant, so instead each cumulative PREFIX
of the gate pipeline is timed with the fori-loop-inside-jit method (constant
amortized over K iterations); successive differences give per-stage cost.

Stages (parallel/mesh.batched_and_relin_modswitch):
  and        pointwise mul_modp in NTT domain
  intt1      inv_linear of the product (fused INTT + mod-p)
  barrett1   polynomial Barrett reduction (2 fwd + 1 inv NTT batches inside)
  icrt       fused ICRT to RAW words
  relin      digit NTTs (fused windowing) + eval-key contraction
  intt2      inv_linear of the relinearized sum
  barrett2   second Barrett reduction
  modswitch  CRT-domain modulus switch

Run: python scripts/tpu_probe_gate_stages.py [K] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import __graft_entry__ as ge
    from cuhe_tpu.ops import barrett as barrett_ops
    from cuhe_tpu.ops import crt as crt_ops
    from cuhe_tpu.ops import modp, ntt_kernels as nk
    from cuhe_tpu.ops import pointwise as pw
    from cuhe_tpu.ops import relin as relin_ops
    from cuhe_tpu.parallel.mesh import step_table_args

    ctx = ge._make_ctx()
    pr = ctx.params
    lvl = 0
    pn = pr.num_crt_prime_lvl(lvl)
    knum = pr.num_eval_key_lvl(lvl)
    w = pr.log_relin
    n = ctx.n
    mod_len = ctx.mod_len
    layout = ctx.ntt_layout
    primes_np = ctx.primes_np[:pn]
    mus_np = (ctx.mus_np[0][:pn], ctx.mus_np[1][:pn])
    m_words, mi_words, bi = ctx._icrt[lvl]
    invp_last = ctx.invp_np[pn - 1, : pn - 1]
    ek_lo, ek_hi, u_lo, u_hi, m_lo, m_hi, m_crt_full = step_table_args(ctx)
    log(f"config: pn={pn} knum={knum} w={w} n={n} batch={batch} K={K}")

    args = tuple(map(jnp.asarray, ge._example_batch(ctx, batch)))

    def stages(a_lo, a_hi, b_lo, b_hi, upto):
        pj = jnp.asarray(primes_np)
        muj = (jnp.asarray(mus_np[0]), jnp.asarray(mus_np[1]))
        u_ntt = (u_lo[:pn], u_hi[:pn])
        m_ntt = (m_lo[:pn], m_hi[:pn])
        m_crt = m_crt_full[:pn]
        out = prod = modp.mul_modp((a_lo, a_hi), (b_lo, b_hi))
        if upto >= 1:
            out = full = nk.inv_linear(prod, n, pj, muj, layout=layout)
        if upto >= 2:
            out = red = barrett_ops.barrett_reduce(
                full, mod_len=mod_len, n=n, u_ntt=u_ntt, m_ntt=m_ntt,
                m_crt=m_crt, primes=pj, mus=muj, layout=layout)
        if upto >= 3:
            out = raw = crt_ops.icrt_to_raw_fused(red, primes_np, mus_np, bi,
                                                  mi_words, m_words)
        if upto >= 4:
            out = rl = relin_ops.relinearize(raw, ek_lo, ek_hi, w=w,
                                             knum=knum, pnum=pn, n=n,
                                             layout=layout)
        if upto >= 5:
            out = full2 = nk.inv_linear(rl, n, pj, muj, layout=layout)
        if upto >= 6:
            out = red2 = barrett_ops.barrett_reduce(
                full2, mod_len=mod_len, n=n, u_ntt=u_ntt, m_ntt=m_ntt,
                m_crt=m_crt, primes=pj, mus=muj, layout=layout)
        if upto >= 7:
            out = pw.mod_switch(red2, pj, muj, jnp.asarray(invp_last),
                                pr.mod_msg)
        return out

    names = ["and", "intt1", "barrett1", "icrt", "relin", "intt2",
             "barrett2", "modswitch"]

    def time_prefix(upto):
        def body(i, carry):
            out = stages(*carry, upto)
            o = out[0] if isinstance(out, tuple) else out
            s = o.reshape(-1)[0]  # data dependency between iterations
            return (carry[0] + s, carry[1], carry[2], carry[3])

        f = jax.jit(lambda a: lax.fori_loop(0, K, body, a))
        t0 = time.time()
        np.asarray(f(args)[0][0, 0, :1])
        log(f"  prefix {upto} ({names[upto]}): compile {time.time()-t0:.0f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(args)[0][0, 0, :1])
            best = min(best, time.perf_counter() - t0)
        return best / K

    ts = []
    for upto in range(8):
        ts.append(time_prefix(upto))
        log(f"prefix<={names[upto]}: {ts[-1]*1e3:.3f} ms/call")
    log("\n--- per-stage attribution (ms per call, batch=%d) ---" % batch)
    prev = 0.0
    for name, t in zip(names, ts):
        log(f"{name:10s} {1e3*(t - prev):7.3f}")
        prev = t
    log(f"{'TOTAL':10s} {1e3*ts[-1]:7.3f}  "
        f"({1e3*ts[-1]/batch:.3f} ms/ciphertext)")


if __name__ == "__main__":
    main()
