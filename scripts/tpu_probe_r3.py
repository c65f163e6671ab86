"""Round-3 perf probes: 32k/64k factorization sweep + ninv-folded inverse.

Tasks (run sequentially in one process to keep the fori compile warm):
  fwd32  - 32k forward: (256,128) factorization vs shipped (128,256), bt sweep
  inv    - inverse (ninv folded into w1i): 16k/32k/64k bt sweep
  fwd64  - 64k forward: (512,128) factorization vs shipped (256,256)

Usage: python scripts/tpu_probe_r3.py [fwd32] [inv] [fwd64]
Timing: fori-loop-inside-jit (see scripts/tpu_probe_fori.py; tunnel dispatch
~3.4 ms/call makes everything else meaningless).  Every timed config is
bit-exactness-gated on device against the XLA path first.
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


def set_factors(n, f):
    if nk._FACTORS[n] != f:
        nk._FACTORS[n] = f
        nk.tables.cache_clear()
        nk._fwd_call.cache_clear()
        nk._inv_call.cache_clear()
    log(f"factors[{n}] = {nk._FACTORS[n]}")


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


def gate_fwd(n, bt):
    xs = rng.integers(0, 1 << 31, size=(8, n // 2), dtype=np.uint32)
    want = jax.jit(lambda v: ntt.ntt_fwd_batched(v, n, chunk=8))(
        jnp.asarray(xs))
    got = nk.ntt_fwd(jnp.asarray(xs), n, layout="std", bt=bt)
    ok = (np.asarray(got[0]) == np.asarray(want[0])).all() and \
         (np.asarray(got[1]) == np.asarray(want[1])).all()
    assert ok, f"fwd n={n} factors={nk._FACTORS[n]} bt={bt} MISMATCH"
    log(f"fwd n={n} {nk._FACTORS[n]} bt={bt}: bit-exact on device")


def gate_inv(n, bt):
    b = 8
    p = 0xFFF1
    muv = modp.barrett_mu(p)
    xs_lo = rng.integers(0, 1 << 32, size=(b, n), dtype=np.uint64)
    xs_hi = rng.integers(0, 0xFFFFFFFF, size=(b, n), dtype=np.uint64)
    pair = (jnp.asarray(xs_lo.astype(np.uint32)),
            jnp.asarray(xs_hi.astype(np.uint32)))
    pj = jnp.full(b, p, jnp.uint32)
    mu = (jnp.full(b, muv[0], jnp.uint32), jnp.full(b, muv[1], jnp.uint32))
    want = jax.jit(lambda v: ntt.intt_modcrt(
        v, n, pj[:, None], (mu[0][:, None], mu[1][:, None])))(pair)
    got = nk.intt_modcrt(nk.std_to_mat(pair, n), n, pj, mu,
                         layout="mat", bt=bt)
    assert (np.asarray(got) == np.asarray(want)).all(), \
        f"inv n={n} factors={nk._FACTORS[n]} bt={bt} MISMATCH"
    log(f"inv n={n} {nk._FACTORS[n]} bt={bt}: bit-exact on device")


def time_fwd(n, bts, B=512):
    half = n // 2
    x = jnp.asarray(rng.integers(0, 1 << 31, size=(B, half),
                                 dtype=np.uint32))
    for bt in bts:
        def step(c, bt=bt):
            lo, hi = nk.ntt_fwd(c, n, layout="mat", bt=bt)
            return (lo ^ hi).reshape(B, n)[:, :half]
        try:
            dt = fori_time(step, x)
            log(f"FWD n={n} {nk._FACTORS[n]} bt={bt} B={B}: "
                f"{dt/B*1e6:.3f} us/transform")
        except Exception as e:
            log(f"FWD n={n} {nk._FACTORS[n]} bt={bt} FAILED: "
                f"{type(e).__name__}: {str(e)[:140]}")


def time_inv(n, bts, B=512):
    n1, n2 = nk._FACTORS[n]
    p = jnp.asarray(np.full(B, 0xFFF1, np.uint32))
    muv = modp.barrett_mu(0xFFF1)
    mu = (jnp.full(B, muv[0], jnp.uint32), jnp.full(B, muv[1], jnp.uint32))
    hi0 = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(B, n1, n2),
                                   dtype=np.uint64).astype(np.uint32))
    lo0 = jnp.asarray(rng.integers(0, 1 << 32, size=(B, n1, n2),
                                   dtype=np.uint64).astype(np.uint32))
    for bt in bts:
        def istep(c, bt=bt):
            out = nk.intt_modcrt((c, hi0), n, p, mu, layout="mat", bt=bt)
            return out.reshape(B, n1, n2)
        try:
            dt = fori_time(istep, lo0)
            log(f"INV n={n} {nk._FACTORS[n]} bt={bt} B={B}: "
                f"{dt/B*1e6:.3f} us/transform")
        except Exception as e:
            log(f"INV n={n} {nk._FACTORS[n]} bt={bt} FAILED: "
                f"{type(e).__name__}: {str(e)[:140]}")


def task_fwd32():
    log("=== task fwd32 ===")
    set_factors(32768, (256, 128))
    gate_fwd(32768, 8)
    time_fwd(32768, (8, 16, 32))
    set_factors(32768, (128, 256))
    time_fwd(32768, (16,))  # control re-measure, shipped config


def task_inv():
    log("=== task inv (ninv folded) ===")
    for n, bts in ((16384, (8, 16)), (32768, (8, 16)), (65536, (4, 8))):
        gate_inv(n, bts[0])
        time_inv(n, bts, B=512 if n == 16384 else 256)


def task_fwd64():
    log("=== task fwd64 ===")
    set_factors(65536, (512, 128))
    gate_fwd(65536, 4)
    time_fwd(65536, (4, 8), B=256)
    set_factors(65536, (256, 256))
    time_fwd(65536, (8,), B=256)  # control


def main():
    tasks = sys.argv[1:] or ["fwd32", "inv"]
    log(f"device: {jax.devices()[0]}")
    warm_fori()
    for t in tasks:
        {"fwd32": task_fwd32, "inv": task_inv, "fwd64": task_fwd64}[t]()


if __name__ == "__main__":
    main()
