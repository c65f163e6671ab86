"""Round-3 probe B: dimension-semantics / bt / VMEM experiments + the
16k-inverse anomaly (inv/fwd ratio ~3x at 16k vs ~2x at 32k/64k).

Usage: python scripts/tpu_probe_r3b.py
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

from cuhe_tpu.ops import modp, ntt, ntt_kernels as nk


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def clear_calls():
    nk._fwd_call.cache_clear()
    nk._inv_call.cache_clear()


def set_factors(n, f):
    if nk._FACTORS[n] != f:
        nk._FACTORS[n] = f
        nk.tables.cache_clear()
        clear_calls()


def warm_fori():
    t0 = time.time()
    xp = jnp.ones((8, 128))
    fp = jax.jit(lambda v: lax.fori_loop(0, 4, lambda i, c: c * 1.0001, v))
    np.asarray(fp(xp)[0, :1])
    log(f"fori warm {time.time()-t0:.0f}s")


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


rng = np.random.default_rng(1)


def time_fwd(n, bt, B=512, tag=""):
    half = n // 2
    x = jnp.asarray(rng.integers(0, 1 << 31, size=(B, half),
                                 dtype=np.uint32))

    def step(c):
        lo, hi = nk.ntt_fwd(c, n, layout="mat", bt=bt)
        return (lo ^ hi).reshape(B, n)[:, :half]
    try:
        dt = fori_time(step, x)
        log(f"FWD n={n} {nk._FACTORS[n]} bt={bt} {tag}: "
            f"{dt/B*1e6:.3f} us/transform")
        return dt / B
    except Exception as e:
        log(f"FWD n={n} bt={bt} {tag} FAILED: {type(e).__name__}: "
            f"{str(e)[:140]}")
        return None


def time_inv(n, bt, B=512, tag="", full_err=False):
    n1, n2 = nk._FACTORS[n]
    p = jnp.asarray(np.full(B, 0xFFF1, np.uint32))
    muv = modp.barrett_mu(0xFFF1)
    mu = (jnp.full(B, muv[0], jnp.uint32), jnp.full(B, muv[1], jnp.uint32))
    hi0 = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(B, n1, n2),
                                   dtype=np.uint64).astype(np.uint32))
    lo0 = jnp.asarray(rng.integers(0, 1 << 32, size=(B, n1, n2),
                                   dtype=np.uint64).astype(np.uint32))

    def istep(c):
        out = nk.intt_modcrt((c, hi0), n, p, mu, layout="mat", bt=bt)
        return out.reshape(B, n1, n2)
    try:
        dt = fori_time(istep, lo0)
        log(f"INV n={n} {nk._FACTORS[n]} bt={bt} {tag}: "
            f"{dt/B*1e6:.3f} us/transform")
        return dt / B
    except Exception as e:
        if full_err:
            log(f"INV n={n} bt={bt} FULL ERROR:\n{e}")
        else:
            log(f"INV n={n} bt={bt} {tag} FAILED: {type(e).__name__}: "
                f"{str(e)[:140]}")
        return None


def main():
    log(f"device: {jax.devices()[0]}")
    warm_fori()

    # phase anchors: shipped 16k fwd + inv
    time_fwd(16384, 8, tag="anchor")
    time_inv(16384, 8, tag="anchor")

    # 16k inverse anomaly: smaller bt
    for bt in (2, 4):
        time_inv(16384, bt)
    # full compile error for the failing bt=16 (diagnosis)
    time_inv(16384, 16, full_err=True)

    # 32k (256,128): dimension semantics + small bt
    set_factors(32768, (256, 128))
    time_fwd(32768, 4)
    for sem in ("parallel", "arbitrary"):
        os.environ["CUHE_DIM_SEM"] = sem
        clear_calls()
        time_fwd(32768, 8, tag=f"sem={sem}")
    os.environ.pop("CUHE_DIM_SEM", None)
    clear_calls()
    # higher VMEM cap at bt=16
    os.environ["CUHE_VMEM_LIMIT_MB"] = "100"
    clear_calls()
    time_fwd(32768, 16, tag="vmem=100")
    time_inv(32768, 8, tag="vmem=100 (256,128)")
    os.environ["CUHE_VMEM_LIMIT_MB"] = "64"
    clear_calls()
    # 32k inverse on the (256,128) factorization (gate uses inv too)
    time_inv(32768, 8, tag="(256,128)")
    # re-anchor at end (phase drift)
    set_factors(32768, (128, 256))
    time_fwd(32768, 16, tag="anchor-end")


if __name__ == "__main__":
    main()
