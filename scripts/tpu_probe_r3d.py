"""Round-3 probe D: isolate the 6 us mod_u32 epilogue cost in the inverse.

Variants at 16k, bt=8, B=512 (same kernel as shipped inverse except the
epilogue):
  shipped   intt_modcrt as-is (p/mu per-transform blocks + mod_u32)
  constmod  mod_u32 with COMPILE-TIME constant p/mu (no scal blocks)
  fakemod   p/mu blocks loaded, but epilogue is just (y0 & p) - isolates
            block plumbing from Barrett arithmetic
  nomod     no p/mu blocks, no mod (canonicalize only) - baseline

Usage: python scripts/tpu_probe_r3d.py
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
from jax.experimental import pallas as pl

from cuhe_tpu.ops import modp, ntt_kernels as nk


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fori_time(step, x, iters=32, reps=3):
    f = jax.jit(lambda v: lax.fori_loop(0, iters, lambda i, c: step(c), v))
    t0 = time.time()
    np.asarray(f(x).ravel()[:1])
    log(f"  compile+first {time.time()-t0:.0f}s")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x).ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best / iters


N = 16384
BT = 8
B = 512
P32 = 0xFFF1
MUV = modp.barrett_mu(P32)


def make_variant(variant: str):
    t = nk.tables(N)
    n1, n2 = t["n1"], t["n2"]
    tab_arrays, rebuild = nk._flatten_tabs(t["w2i"], t["w1i"])
    tab_specs = [pl.BlockSpec(a.shape, nk._const2) for a in tab_arrays]
    with_scal = variant in ("fakemod",)

    def kernel(*refs):
        if with_scal:
            (xlo_ref, xhi_ref, p_ref, mulo_ref, muhi_ref,
             twlo_ref, twhi_ref) = refs[:7]
            tabs = refs[7:-1]
        else:
            xlo_ref, xhi_ref, twlo_ref, twhi_ref = refs[:4]
            tabs = refs[4:-1]
        o_ref = refs[-1]
        w2i_tabs, w1i_tabs = rebuild(tabs)
        x = (jnp.swapaxes(xlo_ref[...], 0, 1),
             jnp.swapaxes(xhi_ref[...], 0, 1))
        xd = modp.pair_to_digits8(x)
        a = nk._dot_right(xd, w2i_tabs, n2, n2)
        tw = (twlo_ref[...][:, None, :], twhi_ref[...][:, None, :])
        b = modp.mul_modp(a, tw)
        bd = modp.pair_to_digits8(b)
        y = modp.canonicalize(nk._dot_left(w1i_tabs, bd, n1, n1))
        if variant == "constmod":
            r = modp.mod_u32(y, jnp.uint32(P32),
                             (jnp.uint32(MUV[0]), jnp.uint32(MUV[1])))
        elif variant == "fakemod":
            p = jnp.swapaxes(p_ref[...], 0, 1)
            mu = (jnp.swapaxes(mulo_ref[...], 0, 1),
                  jnp.swapaxes(muhi_ref[...], 0, 1))
            r = (y[0] & p) ^ mu[0] ^ mu[1]
        else:  # nomod
            r = y[0]
        o_ref[...] = jnp.swapaxes(r, 0, 1)

    scal = pl.BlockSpec((BT, 1, 1), lambda i: (i, 0, 0))
    in_specs = [
        pl.BlockSpec((BT, n1, n2), lambda i: (i, 0, 0)),
        pl.BlockSpec((BT, n1, n2), lambda i: (i, 0, 0)),
    ] + ([scal, scal, scal] if with_scal else []) + [
        pl.BlockSpec((n1, n2), nk._const2),
        pl.BlockSpec((n1, n2), nk._const2),
    ] + tab_specs

    @jax.jit
    def call(xlo, xhi, *rest):
        bsz = xlo.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(bsz // BT,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((BT, n1, n2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, n1, n2), jnp.uint32),
            compiler_params=nk._compiler_params(),
        )(xlo, xhi, *rest)

    t_np = [jnp.asarray(a) for a in tab_arrays]
    tw0 = jnp.asarray(t["twi"][0])
    tw1 = jnp.asarray(t["twi"][1])
    if with_scal:
        pv = jnp.full((B, 1, 1), P32, jnp.uint32)
        m0 = jnp.full((B, 1, 1), MUV[0], jnp.uint32)
        m1 = jnp.full((B, 1, 1), MUV[1], jnp.uint32)

        def step(c):
            return call(c, c, pv, m0, m1, tw0, tw1, *t_np)
    else:
        def step(c):
            return call(c, c, tw0, tw1, *t_np)
    return step


def main():
    rng = np.random.default_rng(1)
    log(f"device: {jax.devices()[0]}")
    t0 = time.time()
    xp = jnp.ones((8, 128))
    fp = jax.jit(lambda v: lax.fori_loop(0, 4, lambda i, c: c * 1.0001, v))
    np.asarray(fp(xp)[0, :1])
    log(f"fori warm {time.time()-t0:.0f}s")

    n1, n2 = nk._FACTORS[N]
    x0 = jnp.asarray(rng.integers(0, 1 << 31, size=(B, n1, n2),
                                  dtype=np.uint32))

    p = jnp.asarray(np.full(B, P32, np.uint32))
    mu = (jnp.full(B, MUV[0], jnp.uint32), jnp.full(B, MUV[1], jnp.uint32))

    def shipped(c):
        return nk.intt_modcrt((c, c), N, p, mu, layout="mat", bt=BT
                              ).reshape(B, n1, n2)
    dt = fori_time(shipped, x0)
    log(f"shipped : {dt/B*1e6:.3f} us/transform")

    for v in ("nomod", "constmod", "fakemod"):
        try:
            dt = fori_time(make_variant(v), x0)
            log(f"{v:8s}: {dt/B*1e6:.3f} us/transform")
        except Exception as e:
            log(f"{v} FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
