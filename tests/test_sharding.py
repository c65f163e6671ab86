"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Validates that the flagship fused gate step (AND + relinearization +
modswitch) produces bit-identical results when jitted over a (batch, crt)
Mesh with NamedShardings vs a single device, and that ciphertext resharding
(the GSPMD replacement for moveTo/copyTo, CuHE.cu:217-256) round-trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cuhe_tpu.context import Context
from cuhe_tpu.params import make_params
from cuhe_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def small_ctx():
    params = make_params(3, 2, 16, 50, 25, 8191)
    ctx = Context(params)
    rng = np.random.default_rng(0)
    shape = (params.num_eval_key, params.num_crt_prime, params.ntt_len)
    ek_lo = rng.integers(0, 1 << 32, size=shape, dtype=np.uint64).astype(np.uint32)
    ek_hi = rng.integers(0, 0xFFFFFFFF, size=shape, dtype=np.uint64).astype(np.uint32)
    ctx.set_eval_keys(ek_lo, ek_hi)
    return ctx


def _args(ctx, batch, rng):
    pn = ctx.params.num_crt_prime
    n = ctx.params.ntt_len
    lo = lambda: rng.integers(0, 1 << 32, size=(batch, pn, n),
                              dtype=np.uint64).astype(np.uint32)
    hi = lambda: rng.integers(0, 0xFFFFFFFF, size=(batch, pn, n),
                              dtype=np.uint64).astype(np.uint32)
    return lo(), hi(), lo(), hi()


def test_sharded_step_matches_single_device(small_ctx):
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(42)
    args = _args(small_ctx, batch=4, rng=rng)

    step = pmesh.batched_and_relin_modswitch(small_ctx, lvl=0)
    tbl = pmesh.step_table_args(small_ctx)
    want = np.asarray(jax.jit(step)(*map(jnp.asarray, args), *tbl))

    mesh = pmesh.make_mesh(4, 2)
    fstep = pmesh.jit_sharded_step(small_ctx, 0, mesh)
    sh = pmesh.ciphertext_sharding(mesh)
    dev_args = tuple(jax.device_put(a, sh) for a in args) + tbl
    got = fstep(*dev_args)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got), want)


def test_resharding_roundtrip(small_ctx):
    """Ciphertext movement between placements = jax.device_put resharding."""
    rng = np.random.default_rng(1)
    pn = small_ctx.params.num_crt_prime
    n = small_ctx.params.ntt_len
    x = rng.integers(0, 1 << 32, size=(8, pn, n), dtype=np.uint64).astype(np.uint32)
    mesh = pmesh.make_mesh(4, 2)
    a = jax.device_put(x, pmesh.ciphertext_sharding(mesh))
    b = jax.device_put(a, NamedSharding(mesh, P(None, "crt", None)))
    c = jax.device_put(b, pmesh.replicated(mesh))
    np.testing.assert_array_equal(np.asarray(c), x)
