"""32k factorization experiment: (128,256) [shipped] vs (256,128).

Rationale (r3): per-transform int8 MAC count is ~642M for (128,256)
(stage2 contracts n2=256 at pack=1) vs ~486M for (256,128) (both stages
contract 128 at pack=2, K=256), and n2=128 keeps every row exactly one
native lane tile.  Combine/twiddle cost is factorization-invariant
(n1*n2 = n elements either way), so any delta is MXU + layout.

Times ntt_fwd AND intt_modcrt at bt in {8, 16, 32} for both
factorizations (B=512, fori, scalar-feedback adapter), with a DFT-free
bit-exactness gate: fused(std order) vs the XLA four-step path.

Usage: python scripts/tpu_probe_32k_fact.py
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

N = 32768
B = 512


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def set_factors(n1, n2):
    nk._FACTORS[N] = (n1, n2)
    nk.tables.cache_clear()
    nk._fwd_call.cache_clear()
    nk._inv_call.cache_clear()


def fori_time(step, x, iters=128, reps=3):
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


def gate(rng):
    """Bit-exactness of the CURRENT factorization vs the XLA path."""
    xs = jnp.asarray(rng.integers(0, 1 << 31, size=(4, N // 2),
                                  dtype=np.uint32))
    want = jax.jit(lambda v: ntt.ntt_fwd_batched(v, N, chunk=4))(xs)
    got = nk.ntt_fwd(xs, N, layout="std")
    assert (np.asarray(got[0]) == np.asarray(want[0])).all() and \
           (np.asarray(got[1]) == np.asarray(want[1])).all(), "fwd mismatch"
    # inverse round trip through intt_modcrt
    pv = np.array([4294967291, 3, 65537, 7681], np.uint32)
    mus = np.array([modp.barrett_mu(int(q)) for q in pv], np.uint64)
    mu = (jnp.asarray(mus[:, 0].astype(np.uint32)),
          jnp.asarray(mus[:, 1].astype(np.uint32)))
    want_i = jax.jit(lambda v: ntt.intt_modcrt(
        v, N, jnp.asarray(pv)[:, None], (mu[0][:, None], mu[1][:, None])))(want)
    got_i = nk.intt_modcrt(nk.std_to_mat(got, N), N, jnp.asarray(pv), mu,
                           layout="mat")
    assert (np.asarray(got_i) == np.asarray(want_i)).all(), "inv mismatch"
    log("  gate ok (fwd + intt_modcrt bit-exact vs XLA)")


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1 << 31, size=(B, N // 2),
                                 dtype=np.uint32))
    pv = jnp.asarray(np.full(B, 4294967291, np.uint32))
    mu0, mu1 = modp.barrett_mu(4294967291)
    mu = (jnp.asarray(np.full(B, mu0, np.uint32)),
          jnp.asarray(np.full(B, mu1, np.uint32)))

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--facts", default="128x256,256x128")
    ap.add_argument("--fwd-bts", default="8,16,32")
    ap.add_argument("--inv-bts", default="4,8,16")
    ap.add_argument("--skip-gate", action="store_true",
                    help="skip the on-device XLA-oracle gate (use when "
                         "bit-exactness was already established in "
                         "interpret mode; saves ~10 min of fresh compiles)")
    args = ap.parse_args()
    facts = [tuple(int(v) for v in f.split("x"))
             for f in args.facts.split(",")]
    fwd_bts = [int(v) for v in args.fwd_bts.split(",") if v]
    inv_bts = [int(v) for v in args.inv_bts.split(",") if v]

    for n1, n2 in facts:
        set_factors(n1, n2)
        log(f"=== factorization ({n1},{n2}) ===")
        if not args.skip_gate:
            try:
                gate(rng)
            except AssertionError as e:
                log(f"  GATE FAILED: {e}; skipping")
                continue
        for bt in fwd_bts:
            def fwd_step(c, bt=bt):
                lo, hi = nk.ntt_fwd(c, N, layout="mat", bt=bt)
                return c ^ (lo.ravel()[0] ^ hi.ravel()[0])
            try:
                dt = fori_time(fwd_step, x)
                log(f"  fwd bt={bt:2d}: {dt/B*1e6:.3f} us/transform")
            except Exception as e:
                log(f"  fwd bt={bt} FAILED: {type(e).__name__}: {str(e)[:120]}")
        # inverse: input pair in mat layout
        lo, hi = nk.ntt_fwd(x, N, layout="mat")
        for bt in inv_bts:
            def inv_step(c, bt=bt):
                out = nk.intt_modcrt((c, hi), N, pv, mu, layout="mat", bt=bt)
                return c.at[0, 0, 0].set(c[0, 0, 0] ^ out[0, 0])
            try:
                dt = fori_time(inv_step, lo)
                log(f"  inv bt={bt:2d}: {dt/B*1e6:.3f} us/transform")
            except Exception as e:
                log(f"  inv bt={bt} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
