"""Fori-timed phase ablation of the v2 fwd kernel (dev tool; WRONG results).

Locates per-transform time across: MXU band dots, combine, digit
extraction, twiddle multiply.  Uses loop-inside-jit timing (dispatch
overhead through the tunnel is ~3.4 ms/call).
Run: python scripts/tpu_probe_fori_ablate.py
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

from cuhe_tpu.ops import modp, ntt_kernels as nk


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def warm_fori():
    xp = jnp.ones((8, 128))
    fp = jax.jit(lambda v: lax.fori_loop(0, 4, lambda i, c: c * 1.0001, v))
    np.asarray(fp(xp)[0, :1])


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


def run(n, bt, B, x, label):
    nk._fwd_call.cache_clear()

    def step(c):
        lo, hi = nk.ntt_fwd(c, n, layout="mat", bt=bt)
        return (lo ^ hi).reshape(B, n)[:, : n // 2]

    try:
        dt = fori_time(step, x)
        log(f"{label} n={n} bt={bt}: {dt/B*1e6:.3f} us/transform")
    except Exception as e:
        log(f"{label} FAILED: {type(e).__name__}: {str(e)[:150]}")


def fake_digits8(pair):
    # 8 DISTINCT cheap planes (prevents dot CSE), wrong values
    lo = pair[0]
    return [((lo >> jnp.uint32(i)) & jnp.uint32(15)).astype(jnp.int8)
            for i in range(8)]


def fake_digits5(x):
    return [((x >> jnp.uint32(i)) & jnp.uint32(15)).astype(jnp.int8)
            for i in range(5)]


def fake_combine(ts, bound_log2=25):
    return (ts[0].astype(jnp.uint32), ts[1].astype(jnp.uint32))


def main():
    n, bt, B = 16384, 8, 512
    log(f"device: {jax.devices()[0]}")
    warm_fori()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 1 << 31, size=(B, n // 2),
                                 dtype=np.uint32))

    real = dict(comb=modp.combine_limb_sums_lazy, d8=modp.pair_to_digits8,
                d5=modp.u32_to_digits5, mul=modp.mul_modp,
                canon=modp.canonicalize)

    run(n, bt, B, x, "baseline")

    modp.combine_limb_sums_lazy = fake_combine
    run(n, bt, B, x, "nocombine")
    modp.combine_limb_sums_lazy = real["comb"]

    modp.pair_to_digits8 = fake_digits8
    run(n, bt, B, x, "nodigits8")
    modp.pair_to_digits8 = real["d8"]

    modp.u32_to_digits5 = fake_digits5
    run(n, bt, B, x, "nodigits5")
    modp.u32_to_digits5 = real["d5"]

    modp.mul_modp = lambda a, b: a
    run(n, bt, B, x, "notwiddle")
    modp.mul_modp = real["mul"]

    modp.combine_limb_sums_lazy = fake_combine
    modp.pair_to_digits8 = fake_digits8
    modp.u32_to_digits5 = fake_digits5
    modp.mul_modp = lambda a, b: a
    modp.canonicalize = lambda p: p
    run(n, bt, B, x, "mxuonly")
    modp.combine_limb_sums_lazy = real["comb"]
    modp.pair_to_digits8 = real["d8"]
    modp.u32_to_digits5 = real["d5"]
    modp.mul_modp = real["mul"]
    modp.canonicalize = real["canon"]
    nk._fwd_call.cache_clear()


if __name__ == "__main__":
    main()
