"""Phase-ablation probe for the v2 fwd NTT kernel on TPU (dev tool).

Monkeypatches individual VPU phases of the kernel body with cheap fakes
(results are WRONG — timing only) to locate where the per-transform time
goes: MXU dots vs combine vs digits vs twiddle.
Run: python scripts/tpu_probe_ablate.py
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

from cuhe_tpu.ops import modp, ntt_kernels as nk


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, x, k=8, reps=3):
    o = f(x)
    np.asarray(o[0].ravel()[:1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            o = f(x)
        np.asarray(o[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best / k


def run(n, bt, B, label):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 1 << 31, size=(B, n // 2),
                                 dtype=np.uint32))
    nk._fwd_call.cache_clear()
    f = jax.jit(lambda v: nk.ntt_fwd(v, n, layout="mat", bt=bt))
    try:
        dt = timeit(f, x)
        log(f"{label} n={n} bt={bt}: {dt/B*1e6:.2f} us/transform")
    except Exception as e:
        log(f"{label} n={n} bt={bt} FAILED: {type(e).__name__}: "
            f"{str(e)[:200]}")


def main():
    n = 16384
    B = 512

    log("=== baselines ===")
    for bt in (8, 16):
        run(n, bt, B, "fwd")

    # --- ablations (WRONG results; timing only) ---
    real_combine = modp.combine_limb_sums_signed
    real_digits = modp.pair_to_digits8
    real_mul = modp.mul_modp

    log("=== ablate combine (VPU recombination) ===")
    modp.combine_limb_sums_signed = lambda ts, bound_log2=25: (
        ts[0].astype(jnp.uint32), ts[1].astype(jnp.uint32))
    run(n, 8, B, "fwd-nocombine")
    modp.combine_limb_sums_signed = real_combine

    log("=== ablate digits8 (stage-2 digit decomposition) ===")
    modp.pair_to_digits8 = lambda pair: [
        (pair[0] & jnp.uint32(127)).astype(jnp.int8)] * 8
    run(n, 8, B, "fwd-nodigits")
    modp.pair_to_digits8 = real_digits

    log("=== ablate twiddle mul_modp ===")
    modp.mul_modp = lambda a, b: a
    run(n, 8, B, "fwd-notwiddle")
    modp.mul_modp = real_mul

    log("=== ablate combine+digits+twiddle (MXU + reshapes only) ===")
    modp.combine_limb_sums_signed = lambda ts, bound_log2=25: (
        ts[0].astype(jnp.uint32), ts[1].astype(jnp.uint32))
    modp.pair_to_digits8 = lambda pair: [
        (pair[0] & jnp.uint32(127)).astype(jnp.int8)] * 8
    modp.mul_modp = lambda a, b: a
    run(n, 8, B, "fwd-mxuonly")
    modp.combine_limb_sums_signed = real_combine
    modp.pair_to_digits8 = real_digits
    modp.mul_modp = real_mul
    nk._fwd_call.cache_clear()

    log("=== inverse kernel ===")
    rng = np.random.default_rng(2)
    n1, n2 = nk._FACTORS[n]
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(B, n1, n2),
                                  dtype=np.uint64).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(B, n1, n2),
                                  dtype=np.uint64).astype(np.uint32))
    p = jnp.asarray(np.full(B, 0xFFF1, np.uint32))
    muv = modp.barrett_mu(0xFFF1)
    mu = (jnp.full(B, muv[0], jnp.uint32), jnp.full(B, muv[1], jnp.uint32))
    for bt in (8, 4, 16):
        f = jax.jit(lambda a, bt=bt: nk.intt_modcrt(
            (a, hi), n, p, mu, layout="mat", bt=bt))
        try:
            dt = timeit(f, lo)
            log(f"inv n={n} bt={bt}: {dt/B*1e6:.2f} us/transform")
        except Exception as e:
            log(f"inv bt={bt} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
