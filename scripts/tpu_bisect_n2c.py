"""Bisect the slow remote compile of the Prince-scale n2c_prod stage.

r4 KAT runs 2-3: the relin_prod0 stage (inv_linear + barrett + icrt at
B=32, pnum=25, 32k) blocked >45 min in the axon remote compile helper
while the same components compiled in 469 s inside the setup's
lax.map-chunked pipeline.  Compile each sub-piece on TPU with timings,
plus a map-chunked variant of the full stage.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from cuhe_tpu.context import Context
    from cuhe_tpu.params import make_params
    from cuhe_tpu.ops import barrett as barrett_ops
    from cuhe_tpu.ops import crt as crt_ops
    from cuhe_tpu.ops import ntt_kernels as nk

    log(f"backend: {jax.default_backend()}")
    t0 = time.time()
    params = make_params(25, 2, 16, 25, 25, 21845)
    ctx = Context(params)
    log(f"ctx: {time.time() - t0:.0f}s")
    n = params.ntt_len
    pn = params.num_crt_prime
    primes = jnp.asarray(ctx.primes_np[:pn])
    mus = (jnp.asarray(ctx.mus_np[0][:pn]), jnp.asarray(ctx.mus_np[1][:pn]))
    m_words, mi_words, bi = ctx._icrt[0]
    B = 32
    sh = jax.ShapeDtypeStruct((B, pn, n), jnp.uint32)
    tabs = [jax.ShapeDtypeStruct(np.asarray(a).shape, np.asarray(a).dtype)
            for a in ctx.barrett_args()]

    def inv_only(p0, p1):
        return nk.inv_linear((p0, p1), n, primes, mus, layout="mat")

    def fwd_mul_inv(p0, p1, u_lo, u_hi, *_):
        g = p0[..., : n // 2]
        t1 = nk.fwd_linear(g, n, layout="mat")
        from cuhe_tpu.ops import modp
        t1 = modp.mul_modp(t1, (u_lo[:pn], u_hi[:pn]))
        return nk.inv_linear(t1, n, primes, mus, layout="mat")

    def barrett_only(f, u_lo, u_hi, m_lo, m_hi, m_crt):
        return barrett_ops.barrett_reduce(
            f, mod_len=ctx.mod_len, n=n,
            u_ntt=(u_lo[:pn], u_hi[:pn]), m_ntt=(m_lo[:pn], m_hi[:pn]),
            m_crt=m_crt[:pn], primes=primes, mus=mus, layout="mat")

    def raw_of_prod(p0, p1, u_lo, u_hi, m_lo, m_hi, m_crt):
        full = inv_only(p0, p1)
        red = barrett_only(full, u_lo, u_hi, m_lo, m_hi, m_crt)
        return crt_ops.icrt_to_raw(red, primes, mus, jnp.asarray(bi),
                                   jnp.asarray(mi_words),
                                   jnp.asarray(m_words))

    def raw_of_prod_mapped(p0, p1, u_lo, u_hi, m_lo, m_hi, m_crt):
        # chunk the ciphertext batch through lax.map with a B=4 body —
        # the shape the setup pipeline compiles in ~8 min
        def body(pp):
            return raw_of_prod(pp[0], pp[1], u_lo, u_hi, m_lo, m_hi, m_crt)
        st = jnp.stack([p0.reshape(8, 4, pn, n), p1.reshape(8, 4, pn, n)],
                       axis=1)
        out = jax.lax.map(body, st)
        return out.reshape((B,) + out.shape[2:])

    budget_name = os.environ.get("CUHE_BISECT_ONLY", "")
    cases = [("inv_only", inv_only, (sh, sh)),
             ("fwd_mul_inv", fwd_mul_inv, (sh, sh) + tuple(tabs)),
             ("barrett_only", barrett_only, (sh,) + tuple(tabs)),
             ("raw_of_prod_mapped", raw_of_prod_mapped,
              (sh, sh) + tuple(tabs)),
             ("raw_of_prod_flat", raw_of_prod, (sh, sh) + tuple(tabs))]
    for name, fn, args in cases:
        if budget_name and budget_name != name:
            continue
        t0 = time.time()
        try:
            jax.jit(fn).lower(*args).compile()
            log(f"{name}: compiled in {time.time() - t0:.0f}s")
        except Exception as e:
            log(f"{name}: FAILED after {time.time() - t0:.0f}s: {str(e)[:300]}")


if __name__ == "__main__":
    main()
