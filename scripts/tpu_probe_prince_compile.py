"""Probe which Prince-scale jit graphs the remote compile helper can take.

r4: the first full S-box layer compile died with `tpu_compile_helper
subprocess exit signal SIGKILL` (examples/prince_kat_full_r04.log).  This
compiles the layer's constituent pieces one at a time at the Prince config
(pnum=25, n=32k, knum=40, batch 32/64) to find the offender / confirm a
stage-split layer compiles.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from cuhe_tpu.context import Context
    from cuhe_tpu.params import make_params
    from cuhe_tpu.ops import barrett as barrett_ops
    from cuhe_tpu.ops import crt as crt_ops
    from cuhe_tpu.ops import ntt_kernels as nk
    from cuhe_tpu.ops import relin as relin_ops

    log(f"backend: {jax.default_backend()}")
    params = make_params(25, 2, 16, 25, 25, 21845)
    ctx = Context(params)
    pr = params
    n = pr.ntt_len
    pn = pr.num_crt_prime
    knum = pr.num_eval_key
    w32 = pr.words_coeff(0)
    log(f"prince config: n={n} pnum={pn} knum={knum} w32={w32}")
    log(f"fit_p: {nk.relin_fused_fit_p(n, pn, pr.log_relin)}")

    rng = np.random.default_rng(0)
    ek_lo = jnp.asarray(rng.integers(0, 1 << 32, size=(knum, pn, n),
                                     dtype=np.uint64).astype(np.uint32))
    ek_hi = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(knum, pn, n),
                                     dtype=np.uint64).astype(np.uint32))

    B = 32
    raw = jnp.asarray(rng.integers(0, 1 << 32, size=(B, w32, n // 2),
                                   dtype=np.uint64).astype(np.uint32))

    def timed(name, fn, *args):
        t0 = time.time()
        try:
            out = fn(*args)
            jax.block_until_ready(out)
            # tiny fetch (block_until_ready unreliable over axon)
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf.ravel()[0])
            log(f"{name}: OK in {time.time() - t0:.1f}s")
            return True
        except Exception as e:
            log(f"{name}: FAILED after {time.time() - t0:.1f}s: {e}")
            return False

    # 1. one relin (pnum-chunked kernel path) at Prince scale, batch 32
    f_relin = jax.jit(lambda r, el, eh: relin_ops.relinearize(
        r, el, eh, w=pr.log_relin, knum=knum, pnum=pn, n=n, layout="mat"))
    timed("relin B=32 (full knum=40)", f_relin, raw, ek_lo, ek_hi)

    # 2. batched forward NTT at scale (c2n of [4,16,pn] planes)
    c = jnp.asarray(rng.integers(0, 1 << 25, size=(64, pn, n // 2),
                                 dtype=np.uint64).astype(np.uint32))
    f_ntt = jax.jit(lambda v: nk.fwd_linear(v, n, layout="mat"))
    timed("fwd_linear [64, 25] planes", f_ntt, c)

    # 3. barrett at scale (batch 64)
    primes = jnp.asarray(ctx.primes_np[:pn])
    mus = (jnp.asarray(ctx.mus_np[0][:pn]), jnp.asarray(ctx.mus_np[1][:pn]))
    pair = (jnp.asarray(rng.integers(0, 1 << 32, size=(64, pn, n),
                                     dtype=np.uint64).astype(np.uint32)),
            jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(64, pn, n),
                                     dtype=np.uint64).astype(np.uint32)))

    def f_barrett(p0, p1, u_lo, u_hi, m_lo, m_hi, m_crt):
        full = nk.inv_linear((p0, p1), n, primes, mus, layout="mat")
        return barrett_ops.barrett_reduce(
            full, mod_len=ctx.mod_len, n=n,
            u_ntt=(u_lo[:pn], u_hi[:pn]), m_ntt=(m_lo[:pn], m_hi[:pn]),
            m_crt=m_crt[:pn], primes=primes, mus=mus, layout="mat")

    timed("inv+barrett B=64", jax.jit(f_barrett), pair[0], pair[1],
          *ctx.barrett_args())

    # 4. icrt at scale
    m_words, mi_words, bi = ctx._icrt[0]
    cr = jnp.asarray(np.stack([
        rng.integers(0, int(p), size=(64, pr.crt_len), dtype=np.uint64)
        .astype(np.uint32) for p in ctx.primes_np[:pn]], axis=1))
    f_icrt = jax.jit(lambda v: crt_ops.icrt_to_raw(
        v, primes, mus, jnp.asarray(bi), jnp.asarray(mi_words),
        jnp.asarray(m_words)))
    timed("icrt B=64", f_icrt, cr)


if __name__ == "__main__":
    main()
