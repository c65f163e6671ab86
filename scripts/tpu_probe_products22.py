"""Bisect the lvl-22 `products` TPU worker fault (KAT layer 11).

scripts/tpu_probe_layer12.py showed the crash happens at the FIRST
stage fetch: `products` = fwd NTT (32k, bt=16, grid 12 at pnum=3) +
mul_modp + concats.  Run each piece alone at the exact shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from cuhe_tpu.ops import modp
    from cuhe_tpu.ops import ntt_kernels as nk

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"backend: {jax.default_backend()}  which={which}")
    n = 32768
    clen = n // 2
    pn = 3
    ps = np.array([4294475777, 4293918721, 4293492737], dtype=np.uint64)
    rng = np.random.default_rng(7)
    state = (rng.integers(0, 1 << 62, size=(64, pn, clen), dtype=np.uint64)
             % ps[None, :, None]).astype(np.uint32)
    t0 = time.time()

    def fetch(name, out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        log(f"{name}: ok ({time.time() - t0:.0f}s)")

    if which in ("all", "fwd_flat"):
        # plain flat batch 192, grid 12
        x = jnp.asarray(state.reshape(-1, clen))
        out = jax.jit(lambda v: nk.fwd_linear(v, n))(x)
        fetch("fwd_flat[192]", out)

    if which in ("all", "fwd_4d"):
        # the exact 4D abcd shape products uses
        abcd = jnp.asarray(np.stack([state[0::4], state[1::4],
                                     state[2::4], state[3::4]]))
        out = jax.jit(lambda v: nk.fwd_linear(v, n))(abcd)
        fetch("fwd_4d[4,16,3]", out)

    if which in ("all", "products_jit"):
        # full products stage body (fwd + 6 muls + concats) in ONE jit
        def products(st):
            abcd = jnp.stack([st[0::4], st[1::4], st[2::4], st[3::4]])
            nt = nk.fwd_linear(abcd, n)
            A = (nt[0][0], nt[1][0])
            B = (nt[0][1], nt[1][1])
            C = (nt[0][2], nt[1][2])
            D = (nt[0][3], nt[1][3])
            mul = modp.mul_modp
            prods = {"ab": mul(A, B), "ac": mul(A, C), "ad": mul(A, D),
                     "bc": mul(B, C), "bd": mul(B, D), "cd": mul(C, D)}
            rl = (jnp.concatenate([prods["ab"][0], prods["cd"][0]]),
                  jnp.concatenate([prods["ab"][1], prods["cd"][1]]))
            ot = (jnp.concatenate([prods[k][0]
                                   for k in ("ac", "ad", "bc", "bd")]),
                  jnp.concatenate([prods[k][1]
                                   for k in ("ac", "ad", "bc", "bd")]))
            return rl[0], rl[1], ot[0], ot[1], abcd
        out = jax.jit(products)(jnp.asarray(state))
        fetch("products_jit", out)

    log("DONE")


def extra(which):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time
    from cuhe_tpu.ops import modp
    from cuhe_tpu.ops import ntt_kernels as nk
    n = 32768
    clen = n // 2
    pn = 3
    ps = np.array([4294475777, 4293918721, 4293492737], dtype=np.uint64)
    rng = np.random.default_rng(7)
    state = (rng.integers(0, 1 << 62, size=(64, pn, clen), dtype=np.uint64)
             % ps[None, :, None]).astype(np.uint32)
    t0 = time.time()

    def fetch(name, out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        log(f"{name}: ok ({time.time() - t0:.0f}s)")

    if which == "stack_fwd":
        def f(st):
            abcd = jnp.stack([st[0::4], st[1::4], st[2::4], st[3::4]])
            return nk.fwd_linear(abcd, n)
        fetch("stack_fwd", jax.jit(f)(jnp.asarray(state)))
    if which == "muls_only":
        abcd = np.stack([state[0::4], state[1::4], state[2::4], state[3::4]])
        nt = jax.jit(lambda v: nk.fwd_linear(v, n))(jnp.asarray(abcd))
        nt = (np.asarray(nt[0]), np.asarray(nt[1]))  # host roundtrip
        def g(lo, hi):
            A = (lo[0], hi[0]); B = (lo[1], hi[1])
            C = (lo[2], hi[2]); D = (lo[3], hi[3])
            mul = modp.mul_modp
            prods = {"ab": mul(A, B), "ac": mul(A, C), "ad": mul(A, D),
                     "bc": mul(B, C), "bd": mul(B, D), "cd": mul(C, D)}
            rl = (jnp.concatenate([prods["ab"][0], prods["cd"][0]]),
                  jnp.concatenate([prods["ab"][1], prods["cd"][1]]))
            ot = (jnp.concatenate([prods[k][0] for k in ("ac","ad","bc","bd")]),
                  jnp.concatenate([prods[k][1] for k in ("ac","ad","bc","bd")]))
            return rl[0], rl[1], ot[0], ot[1]
        fetch("muls_only", jax.jit(g)(jnp.asarray(nt[0]), jnp.asarray(nt[1])))
    if which == "fwd_mul1":
        def h(st):
            abcd = jnp.stack([st[0::4], st[1::4], st[2::4], st[3::4]])
            nt = nk.fwd_linear(abcd, n)
            A = (nt[0][0], nt[1][0]); B = (nt[0][1], nt[1][1])
            ab = modp.mul_modp(A, B)
            return ab
        fetch("fwd_mul1", jax.jit(h)(jnp.asarray(state)))
    log("EXTRA DONE")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("stack_fwd", "muls_only",
                                             "fwd_mul1"):
        extra(sys.argv[1])
    else:
        main()
