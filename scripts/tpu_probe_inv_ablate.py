"""Ablation of the inverse kernel: which piece costs 2.5x the forward?

Variants (all at 16k, bt=8, B=512, fori-timed):
  full       shipped intt_modcrt (digits8 -> dot -> twiddle -> digits8 ->
             dot -> canonicalize -> mod_u32)
  nomod      stop after canonicalize (skip mod_u32): output y lo plane
  stage1     stop after the twiddle multiply: output b lo plane
  digits     digits8 of input + sum of digit planes only (no dots)
  fwd        forward kernel (reference point)

Usage: python scripts/tpu_probe_inv_ablate.py
"""
import functools
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


def make_ablate(upto: str):
    t = nk.tables(N)
    n1, n2 = t["n1"], t["n2"]
    tab_arrays, rebuild = nk._flatten_tabs(t["w2i"], t["w1i"])
    tab_specs = [pl.BlockSpec(a.shape, nk._const2) for a in tab_arrays]

    def kernel(*refs):
        xlo_ref, xhi_ref, twlo_ref, twhi_ref = refs[:4]
        o_ref = refs[-1]
        w2i_tabs, w1i_tabs = rebuild(refs[4:-1])
        x = (jnp.swapaxes(xlo_ref[...], 0, 1),
             jnp.swapaxes(xhi_ref[...], 0, 1))
        xd = modp.pair_to_digits8(x)
        if upto == "digits":
            acc = xd[0]
            for d in xd[1:]:
                acc = acc + d
            o_ref[...] = jnp.swapaxes(acc.astype(jnp.uint32), 0, 1)
            return
        a = nk._dot_right(xd, w2i_tabs, n2, n2)
        tw = (twlo_ref[...][:, None, :], twhi_ref[...][:, None, :])
        b = modp.mul_modp(a, tw)
        if upto == "stage1":
            o_ref[...] = jnp.swapaxes(b[0], 0, 1)
            return
        bd = modp.pair_to_digits8(b)
        y = modp.canonicalize(nk._dot_left(w1i_tabs, bd, n1, n1))
        o_ref[...] = jnp.swapaxes(y[0], 0, 1)

    @jax.jit
    def call(xlo, xhi, twlo, twhi, *tabs):
        bsz = xlo.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(bsz // BT,),
            in_specs=[
                pl.BlockSpec((BT, n1, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((BT, n1, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((n1, n2), nk._const2),
                pl.BlockSpec((n1, n2), nk._const2),
            ] + tab_specs,
            out_specs=pl.BlockSpec((BT, n1, n2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, n1, n2), jnp.uint32),
            compiler_params=nk._compiler_params(),
        )(xlo, xhi, twlo, twhi, *tabs)

    t_np = [jnp.asarray(a) for a in tab_arrays]
    tw0 = jnp.asarray(t["twi"][0])
    tw1 = jnp.asarray(t["twi"][1])

    def step(c):
        out = call(c, c, tw0, tw1, *t_np)
        return out

    return step


def main():
    log(f"device: {jax.devices()[0]}")
    t0 = time.time()
    xp = jnp.ones((8, 128))
    fp = jax.jit(lambda v: lax.fori_loop(0, 4, lambda i, c: c * 1.0001, v))
    np.asarray(fp(xp)[0, :1])
    log(f"fori warm {time.time()-t0:.0f}s")

    rng = np.random.default_rng(1)
    n1, n2 = nk._FACTORS[N]
    x0 = jnp.asarray(rng.integers(0, 1 << 31, size=(B, n1, n2),
                                  dtype=np.uint32))

    # forward reference point
    half = N // 2
    xf = jnp.asarray(rng.integers(0, 1 << 31, size=(B, half),
                                  dtype=np.uint32))

    def fwd_step(c):
        lo, hi = nk.ntt_fwd(c, N, layout="mat", bt=BT)
        return c ^ (lo.ravel()[0] ^ hi.ravel()[0])
    dt = fori_time(fwd_step, xf)
    log(f"fwd          : {dt/B*1e6:.3f} us/transform (scalar adapter)")

    for upto in ("digits", "stage1", "nomod", "full"):
        if upto == "full":
            p = jnp.asarray(np.full(B, 0xFFF1, np.uint32))
            muv = modp.barrett_mu(0xFFF1)
            mu = (jnp.full(B, muv[0], jnp.uint32),
                  jnp.full(B, muv[1], jnp.uint32))

            def step(c):
                return nk.intt_modcrt((c, c), N, p, mu, layout="mat", bt=BT
                                      ).reshape(B, n1, n2)
        else:
            step = make_ablate(upto)
        try:
            dt = fori_time(step, x0)
            log(f"{upto:12s} : {dt/B*1e6:.3f} us/transform")
        except Exception as e:
            log(f"{upto} FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
