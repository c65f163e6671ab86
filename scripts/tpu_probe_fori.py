"""On-device fori-loop timing of the v2 kernels (true per-transform time).

Dispatch overhead through the axon tunnel is ~3.4 ms per call (see
scripts/tpu_probe_calib.py), so only loop-inside-jit timing is meaningful
below that.  Run: python scripts/tpu_probe_fori.py [n]
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


def main():
    ns = [int(v) for v in sys.argv[1:]] or [16384]
    log(f"device: {jax.devices()[0]}")
    warm_fori()
    for n in ns:
        run_one(n)


def run_one(n):
    B = 512 if n == 16384 else 256
    log(f"--- n={n} (B={B}) ---")
    rng = np.random.default_rng(1)
    n1, n2 = nk._FACTORS[n]
    half = n // 2

    # correctness gate on device for the benched path
    xs = rng.integers(0, 1 << 31, size=(8, half), dtype=np.uint32)
    want = jax.jit(lambda v: ntt.ntt_fwd_batched(v, n, chunk=8))(
        jnp.asarray(xs))
    got = nk.ntt_fwd(jnp.asarray(xs), n, layout="std", bt=4)
    assert (np.asarray(got[0]) == np.asarray(want[0])).all() and \
           (np.asarray(got[1]) == np.asarray(want[1])).all(), "fwd mismatch!"
    log("fwd v2 bit-exact on device")

    x = jnp.asarray(rng.integers(0, 1 << 31, size=(B, half),
                                 dtype=np.uint32))
    for bt in (8, 16):
        def step(c, bt=bt):
            lo, hi = nk.ntt_fwd(c, n, layout="mat", bt=bt)
            return (lo ^ hi).reshape(B, n)[:, :half]
        try:
            dt = fori_time(step, x)
            log(f"fwd n={n} bt={bt}: {dt/B*1e6:.3f} us/transform (fori)")
        except Exception as e:
            log(f"fwd bt={bt} FAILED: {type(e).__name__}: {str(e)[:150]}")

    p = jnp.asarray(np.full(B, 0xFFF1, np.uint32))
    muv = modp.barrett_mu(0xFFF1)
    mu = (jnp.full(B, muv[0], jnp.uint32), jnp.full(B, muv[1], jnp.uint32))
    hi0 = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(B, n1, n2),
                                   dtype=np.uint64).astype(np.uint32))
    lo0 = jnp.asarray(rng.integers(0, 1 << 32, size=(B, n1, n2),
                                   dtype=np.uint64).astype(np.uint32))
    for bt in (4, 8):
        def istep(c, bt=bt):
            out = nk.intt_modcrt((c, hi0), n, p, mu, layout="mat", bt=bt)
            return out.reshape(B, n1, n2)
        try:
            dt = fori_time(istep, lo0)
            log(f"inv n={n} bt={bt}: {dt/B*1e6:.3f} us/transform (fori)")
        except Exception as e:
            log(f"inv bt={bt} FAILED: {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
