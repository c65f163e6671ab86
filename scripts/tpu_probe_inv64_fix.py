"""Round-5 probe: the 64k inverse (bt=4) must lower on TPU at grid>1.

The r4 bench crash: 2D (4, 256) p/mu blocks violate Mosaic's 8-sublane
divisibility rule.  Fix: 3D [B, 1, n2] layout when bt % 8 != 0.  This
probe compiles the fused intt_modcrt at every (n, bt) the library can
select, times the compiles, and checks bit-exactness vs the XLA path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from cuhe_tpu.ops import ntt, ntt_kernels as nk
from cuhe_tpu import hostmath as hm
from cuhe_tpu.ops import modp

rng = np.random.default_rng(0)

def check(n, b, bt):
    p = np.uint32(0xFFFFFE21)
    mu = modp.barrett_mu(int(p))
    x = rng.integers(0, 1 << 64, size=(b, n), dtype=np.uint64)
    x = x % hm.P
    lo = jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((x >> 32).astype(np.uint32))
    pv = jnp.full((b,), p, jnp.uint32)
    mul = jnp.full((b,), np.uint32(mu[0]), jnp.uint32)
    muh = jnp.full((b,), np.uint32(mu[1]), jnp.uint32)
    t0 = time.time()
    out = nk.intt_modcrt((lo, hi), n, pv, (mul, muh), layout="std", bt=bt)
    out = np.asarray(jax.block_until_ready(out))
    t1 = time.time()
    print(f"  fused done {t1-t0:.1f}s", flush=True)
    ref = ntt.intt_modcrt((lo, hi), n, pv[:, None],
                          (mul[:, None], muh[:, None]))
    ref = np.asarray(jax.block_until_ready(ref))
    print(f"  oracle done {time.time()-t1:.1f}s", flush=True)
    ok = np.array_equal(out, ref)
    print(f"n={n} b={b} bt={bt} grid={b // bt}: compile+run {t1 - t0:.1f}s "
          f"exact={ok}", flush=True)
    return ok

allok = True
for n, bts in ((65536, (4,)), (16384, (8,)), (32768, (8,))):
    for bt in bts:
        allok &= check(n, bt, bt)          # grid 1
        allok &= check(n, 4 * bt, bt)      # grid 4
print("ALL OK" if allok else "FAIL")
sys.exit(0 if allok else 1)
