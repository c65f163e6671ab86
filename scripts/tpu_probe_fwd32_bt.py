"""32k forward-NTT config sweep: bt in {16, 32} x dimension_semantics in
{default, parallel}, b512, fori-timed — the experiments queued in
NOTES_ROUND4.md:72-75 (the 8.05 us/transform reference bar,
/root/reference/doc/Perf_NTT.txt:14).

CUHE_DIM_SEM is read at trace time inside _compiler_params; the kernel
call cache is keyed on (n, bt) only, so each (bt, sem) combo runs in a
fresh cache state via cache_clear().
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

from cuhe_tpu.ops import ntt_kernels as nk


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fori_time(step, x, iters=64, reps=3):
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
    n = 32768
    b = 512
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1 << 31, size=(b, n // 2),
                                 dtype=np.uint32))

    def step_for(bt):
        def step(c):
            lo, hi = nk.ntt_fwd(c, n, layout="mat", bt=bt)
            s = lo.ravel()[0] ^ hi.ravel()[0]
            return c ^ s
        return step

    combos = []
    for sem in ("", "parallel"):
        for bt in (16, 32):
            combos.append((sem, bt))
    for sem, bt in combos:
        os.environ["CUHE_DIM_SEM"] = sem
        nk._fwd_call.cache_clear()
        tag = f"bt={bt} sem={sem or 'default'}"
        log(f"--- {tag}")
        try:
            t = fori_time(step_for(bt), x)
            log(f"{tag}: {t / b * 1e6:.2f} us/transform")
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}")
    os.environ.pop("CUHE_DIM_SEM", None)
    log("SWEEP DONE")


if __name__ == "__main__":
    main()
