"""Multi-chip homomorphic gate pipeline over a (batch, crt) mesh.

The reference's multi-GPU story is an OpenMP thread per device with
ciphertexts pinned to devices and peer copies between them
(examples/Prince/Prince.cu:194-201, cuhe/CuHE.cu:217-256).  Here the same
workload shape — many independent ciphertexts flowing through
AND+relin+modswitch — runs SPMD: a jax.sharding.Mesh with axes
(batch, crt), ciphertext batches sharded over `batch`, CRT prime planes
over `crt`, eval keys sharded over `crt`, everything else replicated.

Run on a real multi-chip slice as-is, or simulate on CPU with:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/run_sharded_gates.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    if jax.default_backend() != "tpu" and len(jax.devices()) == 1:
        print("hint: set XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "for a virtual mesh")
    from cuhe_tpu.context import Context
    from cuhe_tpu.params import make_params
    from cuhe_tpu.parallel import mesh as pmesh

    ndev = len(jax.devices())
    n_crt = 2 if ndev % 2 == 0 else 1
    n_batch = ndev // n_crt
    print(f"devices: {ndev} -> mesh (batch={n_batch}, crt={n_crt})")

    params = make_params(3, 2, 16, 50, 25, 8191)
    ctx = Context(params)
    rng = np.random.default_rng(0)
    pn = params.num_crt_prime
    shape = (params.num_eval_key, pn, params.ntt_len)
    ek_lo = rng.integers(0, 1 << 32, size=shape, dtype=np.uint64).astype(np.uint32)
    ek_hi = rng.integers(0, 0xFFFFFFFF, size=shape, dtype=np.uint64).astype(np.uint32)
    ctx.set_eval_keys(ek_lo, ek_hi)

    mesh = pmesh.make_mesh(n_batch, n_crt)
    step = pmesh.jit_sharded_step(ctx, 0, mesh)

    batch = 2 * n_batch
    mk = lambda: rng.integers(0, 1 << 32, size=(batch, pn, params.ntt_len),
                              dtype=np.uint64).astype(np.uint32)
    mh = lambda: rng.integers(0, 0xFFFFFFFF, size=(batch, pn, params.ntt_len),
                              dtype=np.uint64).astype(np.uint32)
    args = (mk(), mh(), mk(), mh())
    sh = pmesh.ciphertext_sharding(mesh)
    dev_args = tuple(jax.device_put(a, sh) for a in args)
    tables = pmesh.step_table_args(ctx)

    t0 = time.time()
    out = step(*dev_args, *tables)
    np.asarray(out[0, 0, :1])  # fetch = real sync (axon block_until_ready
    print(f"compile+first step: {time.time() - t0:.1f}s")  # does not block)

    t0 = time.time()
    iters = 4
    for _ in range(iters):
        out = step(*dev_args, *tables)
    np.asarray(out[0, 0, :1])
    dt = (time.time() - t0) / iters / batch
    print(f"fused AND+relin+modswitch: {dt * 1e3:.2f} ms/ciphertext "
          f"(batch {batch}, {ndev} devices)")
    print("output:", out.shape, out.dtype, "sharding:", out.sharding)


if __name__ == "__main__":
    main()
