"""Session-6 probe: inverse-mode A/B, i16xi8 dot support, fwd reconfirm.

Run: python scripts/tpu_probe_s6.py
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


def warm_fori():
    t0 = time.time()
    xp = jnp.ones((8, 128))
    fp = jax.jit(lambda v: lax.fori_loop(0, 4, lambda i, c: c * 1.0001, v))
    np.asarray(fp(xp)[0, :1])
    log(f"fori warm {time.time()-t0:.0f}s")


def fori_time(step, x, iters=16, reps=3):
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


def try_i16_dot():
    """Does Mosaic lower an i16 x i8 -> i32 dot?  And at what speed?"""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-30000, 30000, size=(1024, 1024))
                    .astype(np.int16))
    b = jnp.asarray(rng.integers(-100, 100, size=(1024, 1024))
                    .astype(np.int8))
    try:
        f = jax.jit(lambda x, y: pl.pallas_call(
            kernel, grid=(64,),
            in_specs=[pl.BlockSpec((1024, 1024), lambda i: (0, 0)),
                      pl.BlockSpec((1024, 1024), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1024, 1024), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1024, 1024), jnp.int32),
        )(x, y))
        o = f(a, b)
        got = np.asarray(o)
        want = a.astype(np.int64) @ np.asarray(b).astype(np.int64)
        ok = (got == np.asarray(want, dtype=np.int64)).all()
        t0 = time.perf_counter()
        for _ in range(4):
            o = f(a, b)
        np.asarray(o.ravel()[:1])
        dt = (time.perf_counter() - t0) / 4
        fl = 2.0 * 1024**3 * 64
        log(f"i16xi8 dot: exact={ok}, {dt*1e3:.2f} ms/call ->"
            f" {fl/dt/1e12:.0f} Tops/s")
    except Exception as e:
        log(f"i16xi8 dot unsupported: {type(e).__name__}: {str(e)[:160]}")

    # i16 x i16 as well
    b16 = jnp.asarray(rng.integers(-30000, 30000, size=(1024, 1024))
                      .astype(np.int16))
    try:
        f = jax.jit(lambda x, y: pl.pallas_call(
            kernel, grid=(64,),
            in_specs=[pl.BlockSpec((1024, 1024), lambda i: (0, 0)),
                      pl.BlockSpec((1024, 1024), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1024, 1024), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1024, 1024), jnp.int32),
        )(x, y))
        o = f(a, b16)
        t0 = time.perf_counter()
        for _ in range(4):
            o = f(a, b16)
        np.asarray(o.ravel()[:1])
        dt = (time.perf_counter() - t0) / 4
        fl = 2.0 * 1024**3 * 64
        log(f"i16xi16 dot: {dt*1e3:.2f} ms/call -> {fl/dt/1e12:.0f} Tops/s")
    except Exception as e:
        log(f"i16xi16 dot unsupported: {type(e).__name__}: {str(e)[:160]}")


def main():
    n = 16384
    B = 512
    log(f"device: {jax.devices()[0]}")
    warm_fori()
    try_i16_dot()

    rng = np.random.default_rng(2)
    n1, n2 = nk._FACTORS[n]
    p = jnp.asarray(np.full(B, 0xFFF1, np.uint32))
    muv = modp.barrett_mu(0xFFF1)
    mu = (jnp.full(B, muv[0], jnp.uint32), jnp.full(B, muv[1], jnp.uint32))
    hi0 = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(B, n1, n2),
                                   dtype=np.uint64).astype(np.uint32))
    lo0 = jnp.asarray(rng.integers(0, 1 << 32, size=(B, n1, n2),
                                   dtype=np.uint64).astype(np.uint32))

    for mode in ("midcontract", "mfirst"):
        os.environ["CUHE_INV_MODE"] = mode
        nk._inv_call.cache_clear()
        for bt in (8,):
            def istep(c, bt=bt):
                out = nk.intt_modcrt((c, hi0), n, p, mu, layout="mat", bt=bt)
                return out.reshape(B, n1, n2)
            try:
                dt = fori_time(istep, lo0)
                log(f"inv[{mode}] n={n} bt={bt}: {dt/B*1e6:.3f} us/transform")
            except Exception as e:
                log(f"inv[{mode}] bt={bt} FAILED: {type(e).__name__}:"
                    f" {str(e)[:150]}")
    os.environ.pop("CUHE_INV_MODE", None)


if __name__ == "__main__":
    main()
