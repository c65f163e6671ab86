"""Round-3 probe C: lean mod_u32 inverse + fused relin mulacc on TPU.

Usage: python scripts/tpu_probe_r3c.py
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


def main():
    rng = np.random.default_rng(1)
    log(f"device: {jax.devices()[0]}")
    t0 = time.time()
    xp = jnp.ones((8, 128))
    fp = jax.jit(lambda v: lax.fori_loop(0, 4, lambda i, c: c * 1.0001, v))
    np.asarray(fp(xp)[0, :1])
    log(f"fori warm {time.time()-t0:.0f}s")

    # correctness: inverse with lean mod_u32, on device
    for n in (16384, 32768):
        b = 6
        x64 = rng.integers(0, modp.P, size=(b, n), dtype=np.uint64)
        lo = jnp.asarray((x64 & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((x64 >> 32).astype(np.uint32))
        pv = np.array([4294967291, 3, 65537, 7681, 0xFFF1, 12289],
                      np.uint32)[:b]
        mus = np.array([modp.barrett_mu(int(q)) for q in pv], np.uint64)
        mu = (jnp.asarray(mus[:, 0].astype(np.uint32)),
              jnp.asarray(mus[:, 1].astype(np.uint32)))
        want = jax.jit(lambda v: ntt.intt_modcrt(
            v, n, jnp.asarray(pv)[:, None],
            (mu[0][:, None], mu[1][:, None])))((lo, hi))
        got = nk.intt_modcrt(nk.std_to_mat((lo, hi), n), n, jnp.asarray(pv),
                             mu, layout="mat")
        assert (np.asarray(got) == np.asarray(want)).all(), f"inv {n} WRONG"
        log(f"inv {n} (lean mod_u32): bit-exact on device")

    # correctness: fused relin mulacc on device
    n = 16384
    w, w32, knum, pnum = 16, 4, 5, 3
    raw = jnp.asarray(rng.integers(0, 1 << 32, size=(2, w32, n // 2),
                                   dtype=np.uint64).astype(np.uint32))
    ek_lo = jnp.asarray(rng.integers(0, 1 << 32, size=(knum, pnum, n),
                                     dtype=np.uint64).astype(np.uint32))
    ek_hi = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(knum, pnum, n),
                                     dtype=np.uint64).astype(np.uint32))
    got = nk.relin_digits_mulacc(raw, (ek_lo, ek_hi), n, w=w, j0=0, c=knum,
                                 pnum=pnum, bt=2)
    dl, dh = nk.ntt_fwd_digits(raw, n, w=w, j0=0, c=knum, layout="mat", bt=2)
    el = ek_lo[:, :pnum].reshape(knum, 1, pnum, n)
    eh = ek_hi[:, :pnum].reshape(knum, 1, pnum, n)
    prod = modp.mul_modp((dl[:, :, None, :], dh[:, :, None, :]), (el, eh))
    acc = (prod[0][0], prod[1][0])
    for j in range(1, knum):
        acc = modp.add_modp(acc, (prod[0][j], prod[1][j]))
    assert (np.asarray(got[0]) == np.asarray(acc[0])).all() and \
           (np.asarray(got[1]) == np.asarray(acc[1])).all(), "mulacc WRONG"
    log("relin mulacc: bit-exact on device")

    # timing: inverse at 16k/32k + fwd anchors
    for n, bt, B in ((16384, 8, 512), (32768, 8, 256)):
        half = n // 2
        xf = jnp.asarray(rng.integers(0, 1 << 31, size=(B, half),
                                      dtype=np.uint32))

        def fwd_step(c, n=n):
            lo, hi = nk.ntt_fwd(c, n, layout="mat")
            return c ^ (lo.ravel()[0] ^ hi.ravel()[0])
        dt = fori_time(fwd_step, xf)
        log(f"FWD n={n} anchor: {dt/B*1e6:.3f} us/transform")

        n1, n2 = nk._FACTORS[n]
        p = jnp.asarray(np.full(B, 0xFFF1, np.uint32))
        muv = modp.barrett_mu(0xFFF1)
        mu = (jnp.full(B, muv[0], jnp.uint32),
              jnp.full(B, muv[1], jnp.uint32))
        hi0 = jnp.asarray(rng.integers(0, 0xFFFFFFFF, size=(B, n1, n2),
                                       dtype=np.uint64).astype(np.uint32))
        lo0 = jnp.asarray(rng.integers(0, 1 << 32, size=(B, n1, n2),
                                       dtype=np.uint64).astype(np.uint32))

        def istep(c, n=n, bt=bt):
            out = nk.intt_modcrt((c, hi0), n, p, mu, layout="mat", bt=bt)
            return out.reshape(B, n1, n2)
        dt = fori_time(istep, lo0)
        log(f"INV n={n} bt={bt} (lean mod_u32): {dt/B*1e6:.3f} us/transform")


if __name__ == "__main__":
    main()
