"""TPU microbench for the v2 fused NTT kernels (dev tool, not the bench).

Dispatch-timed (K async dispatches + one tiny fetch) to avoid the tunnel's
pathological first while-loop compile; good enough for A/B between kernel
variants.  Run: python scripts/tpu_probe_v2.py [n] [bts...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from cuhe_tpu.ops import modp, ntt, ntt_kernels


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, x, k=8, reps=3):
    o = f(x)
    np.asarray(o[0].ravel()[:1])  # compile+sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            o = f(x)
        np.asarray(o[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best / k


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    bts = [int(v) for v in sys.argv[2:]] or [1, 2, 4, 8]
    dev = jax.devices()[0]
    log(f"device: {dev}")
    rng = np.random.default_rng(1)
    B = 512
    x = jnp.asarray(rng.integers(0, 1 << 31, size=(B, n // 2),
                                 dtype=np.uint32))

    # correctness spot-check once on-device vs XLA path (8 transforms)
    t0 = time.time()
    want = jax.jit(lambda v: ntt.ntt_fwd_batched(v, n, chunk=8))(x[:8])
    want = (np.asarray(want[0]), np.asarray(want[1]))
    log(f"xla ref compile+run {time.time()-t0:.0f}s")
    t0 = time.time()
    got = ntt_kernels.ntt_fwd(x[:8], n, layout="std", bt=bts[0])
    got = (np.asarray(got[0]), np.asarray(got[1]))
    log(f"v2 first compile+run {time.time()-t0:.0f}s")
    assert (got[0] == want[0]).all() and (got[1] == want[1]).all(), \
        "v2 kernel mismatch on device!"
    log("v2 fwd bit-exact vs XLA on device")

    for bt in bts:
        f = jax.jit(lambda v, bt=bt: ntt_kernels.ntt_fwd(v, n, layout="mat",
                                                         bt=bt))
        dt = timeit(f, x)
        log(f"fwd n={n} bt={bt}: {dt/B*1e6:.2f} us/transform (mat, b={B})")

    # inverse
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(B, n), dtype=np.uint64)
                     .astype(np.uint32)).reshape(B, *ntt_kernels._FACTORS[n])
    hi = jnp.zeros_like(lo)
    p = jnp.asarray(np.full(B, 0xFFF1, np.uint32))
    muv = modp.barrett_mu(0xFFF1)
    mu = (jnp.full(B, muv[0], jnp.uint32), jnp.full(B, muv[1], jnp.uint32))
    for bt in bts:
        f = jax.jit(lambda a, bt=bt: ntt_kernels.intt_modcrt(
            (a, hi), n, p, mu, layout="mat", bt=bt))
        try:
            dt = timeit(f, lo)
            log(f"inv n={n} bt={bt}: {dt/B*1e6:.2f} us/transform")
        except Exception as e:
            log(f"inv bt={bt} failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
