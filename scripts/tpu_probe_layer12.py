"""Isolate the TPU-worker kernel fault in Prince layer 12 (lvl=22).

r4 KAT runs 6+8 both crashed the TPU worker executing the final S-box
layer (pnum 3 -> 2, knum 5/4 — the shallowest level shapes).  Runs each
stage with a host fetch in between on random data at the exact shapes.
"""

import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from cuhe_tpu.context import Context
    from cuhe_tpu.models import prince as pr_mod
    from cuhe_tpu.params import make_params

    log(f"backend: {jax.default_backend()}")
    t0 = time.time()
    params = make_params(25, 2, 16, 25, 25, 21845)
    ctx = Context(params)
    log(f"ctx: {time.time() - t0:.0f}s")
    rng = np.random.default_rng(4)
    knum = params.num_eval_key
    pn_max = params.num_crt_prime
    shape = (knum, pn_max, params.ntt_len)
    ek_lo = rng.integers(0, 1 << 32, size=shape,
                         dtype=np.uint64).astype(np.uint32)
    ek_hi = rng.integers(0, 0xFFFFFFFF, size=shape,
                         dtype=np.uint64).astype(np.uint32)
    ctx.set_eval_keys(ek_lo, ek_hi)
    p = pr_mod.Prince(dhs=SimpleNamespace(ctx=ctx))
    lvl = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    pn = params.num_crt_prime_lvl(lvl)
    ps = np.array(params.crt_primes[:pn], dtype=np.uint64)
    state = (rng.integers(0, 1 << 62, size=(64, pn, params.crt_len),
                          dtype=np.uint64) % ps[None, :, None]).astype(np.uint32)
    tb = p.table_args()
    stages = [(nm, jax.jit(fn)) for nm, fn in
              p._build_sbox_stages(lvl, True)]
    fns = dict(stages)

    def fetch(name, out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        log(f"stage {name}: ok ({time.time() - t0:.0f}s)")

    t0 = time.time()
    nt_lo, nt_hi, abcd = fns["c2n_abcd"](jnp.asarray(state), tb)
    fetch("c2n_abcd", nt_lo)
    rl_lo, rl_hi, ot_lo, ot_hi = fns["pairwise"](nt_lo, nt_hi, tb)
    fetch("pairwise", rl_lo)
    raw0 = fns["relin_prod0"](rl_lo, rl_hi, tb)
    fetch("relin_prod0", raw0)
    rl = fns["relin_main0"](raw0, tb)
    fetch("relin_main0", rl)
    ot_c = fns["reduce_others"](ot_lo, ot_hi, tb)
    fetch("reduce_others", ot_c)
    outs, six = fns["switch_and_xor"](rl, ot_c, abcd, tb)
    fetch("switch_and_xor", outs)
    nt6_lo, nt6_hi = fns["cubic_c2n"](six, tb)
    fetch("cubic_c2n", nt6_lo)
    cub_lo, cub_hi = fns["cubic_mul"](nt6_lo, nt6_hi, tb)
    fetch("cubic_mul", cub_lo)
    cub_c = fns["cubic_n2c"](cub_lo, cub_hi, tb)
    fetch("cubic_n2c", cub_c)
    raw1 = fns["xor_cubic_raw"](outs, cub_c, tb)
    fetch("xor_cubic_raw", raw1)
    outs2 = fns["relin_main1"](raw1, tb)
    fetch("relin_main1", outs2)
    res = fns["switch_final"](outs2, tb)
    fetch("switch_final", res)
    log("ALL STAGES OK")


if __name__ == "__main__":
    main()
