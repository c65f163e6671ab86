"""Stage ablation of the 32k forward kernel: where do 10 us/transform go?

Variants (32k (128,256), bt=16, B=512, fori-timed, scalar adapter):
  io         load x, transpose, digits5, sum digit planes (no dots)
  stage1     + stage-1 left dots + lazy combine (output lazy lo)
  twiddle    + twiddle mul_modp (output canonical lo)
  digits8    + pair_to_digits8 (sum planes)
  full       shipped ntt_fwd
Also 16k full for the per-element scaling reference.

Usage: python scripts/tpu_probe_fwd32_ablate.py
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


def make_ablate(n, bt, upto: str):
    t = nk.tables(n)
    n1, n2 = t["n1"], t["n2"]
    n1h = n1 // 2
    tab_arrays, rebuild = nk._flatten_tabs(t["w1"], t["w2"])
    tab_specs = [pl.BlockSpec(a.shape, nk._const2) for a in tab_arrays]

    def kernel(*refs):
        x_ref, twlo_ref, twhi_ref = refs[0], refs[1], refs[2]
        o_ref = refs[-1]
        w1_tabs, w2_tabs = rebuild(refs[3:-1])
        xt = jnp.swapaxes(x_ref[...], 0, 1)           # [n1h, bt, n2]
        xd = modp.u32_to_digits5(xt)
        if upto == "io":
            acc = xd[0]
            for d in xd[1:]:
                acc = acc + d
            o_ref[...] = jnp.pad(
                jnp.swapaxes(acc.astype(jnp.uint32), 0, 1),
                ((0, 0), (0, n1 - n1h), (0, 0)))
            return
        b = nk._dot_left(w1_tabs, xd, n1, n1h)        # lazy [n1, bt, n2]
        if upto == "stage1":
            o_ref[...] = jnp.swapaxes(b[0], 0, 1)
            return
        tw = (twlo_ref[...][:, None, :], twhi_ref[...][:, None, :])
        c = modp.mul_modp(b, tw)
        if upto == "twiddle":
            o_ref[...] = jnp.swapaxes(c[0], 0, 1)
            return
        cd = modp.pair_to_digits8(c)
        acc = cd[0]
        for d in cd[1:]:
            acc = acc + d
        o_ref[...] = jnp.swapaxes(acc.astype(jnp.uint32), 0, 1)

    @jax.jit
    def call(x, twlo, twhi, *tabs):
        bsz = x.shape[0]
        xm = x.reshape(bsz, n1h, n2)
        return pl.pallas_call(
            kernel,
            grid=(bsz // bt,),
            in_specs=[
                pl.BlockSpec((bt, n1h, n2), lambda i: (i, 0, 0)),
                pl.BlockSpec((n1, n2), nk._const2),
                pl.BlockSpec((n1, n2), nk._const2),
            ] + tab_specs,
            out_specs=pl.BlockSpec((bt, n1, n2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, n1, n2), jnp.uint32),
            compiler_params=nk._compiler_params(),
        )(xm, twlo, twhi, *tabs)

    t_np = [jnp.asarray(a) for a in tab_arrays]
    tw0 = jnp.asarray(t["tw"][0])
    tw1 = jnp.asarray(t["tw"][1])

    def step(c):
        out = call(c, tw0, tw1, *t_np)
        return c ^ out.ravel()[0]

    return step


def main():
    log(f"device: {jax.devices()[0]}")
    t0 = time.time()
    xp = jnp.ones((8, 128))
    fp = jax.jit(lambda v: lax.fori_loop(0, 4, lambda i, c: c * 1.0001, v))
    np.asarray(fp(xp)[0, :1])
    log(f"fori warm {time.time()-t0:.0f}s")

    rng = np.random.default_rng(1)
    for n, bt, B in ((16384, 8, 512), (32768, 16, 512)):
        x = jnp.asarray(rng.integers(0, 1 << 31, size=(B, n // 2),
                                     dtype=np.uint32))

        def full_step(c, n=n, bt=bt):
            lo, hi = nk.ntt_fwd(c, n, layout="mat", bt=bt)
            return c ^ (lo.ravel()[0] ^ hi.ravel()[0])
        dt = fori_time(full_step, x)
        log(f"n={n} full   : {dt/B*1e6:.3f} us/transform (scalar adapter)")
        for upto in ("io", "stage1", "twiddle", "digits8"):
            try:
                dt = fori_time(make_ablate(n, bt, upto), x)
                log(f"n={n} {upto:7s}: {dt/B*1e6:.3f} us/transform")
            except Exception as e:
                log(f"n={n} {upto} FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
