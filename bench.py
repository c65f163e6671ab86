"""Benchmark suite: regenerates the reference's NTT bundle-throughput table
(doc/Perf_NTT.txt, produced by tests/test_ntt.cu) on TPU, with a built-in
correctness gate, plus the fused gate-pipeline benchmark.

Timing methodology: the iteration loop lives INSIDE the jitted computation
(lax.fori_loop with a data dependency chained between iterations), so one
dispatch + one scalar fetch brackets K full transforms.  This removes host
dispatch / tunnel-latency noise, mirroring the reference's cudaEvent timing
around a launch burst (tests/test_ntt.cu:67-100).

Correctness gating (VERDICT r1 item 2): every implementation that can set a
reported number is checked against the O(n^2) DFT oracle (same generator
g = 15893793146607301539 as tests/test_ntt.cu:38-64) IN THIS PROCESS before
it is timed; a mismatch aborts the bench.  The headline is the library's
shipped hot path (fused Pallas kernels in mat layout on TPU), not a min
across differently-configured paths.

Driver-proofing (VERDICT r3 item 4): the ONE stdout JSON line is printed as
soon as the headline point is measured (a timed-out run still parses);
bench_details.json is rewritten incrementally after every section; the fori
probe is capped; the optional XLA-comparison sweeps and the end-of-run
re-measure are skipped when the CUHE_BENCH_BUDGET_S wall-time budget
(default 480 s) runs low.  Section order puts the gate-pipeline number
before the optional sections.

Variance hygiene (VERDICT r1 item 9): each timing records min AND max over
repeats; all raw numbers land in bench_details.json so throttled-phase
results are distinguishable from quiet-phase ones.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is the speedup factor over the reference's recorded number
(baseline_time / our_time; > 1 means faster than the reference GPU).
Everything else goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T_START = time.time()
BUDGET = float(os.environ.get("CUHE_BENCH_BUDGET_S", "480"))


def left() -> float:
    return BUDGET - (time.time() - T_START)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        if jax.default_backend() == "tpu":  # CPU AOT cache can deadlock
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from cuhe_tpu import hostmath as hm
    from cuhe_tpu.ops import modp, ntt, ntt_kernels as nk

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    log(f"backend: {jax.default_backend()}, device: {dev}")

    rng = np.random.default_rng(20260817)
    results = {}
    baseline_ms = {16384: 0.00407564, 32768: 0.00804859, 65536: 0.0226647}
    baseline_b1_ms = {16384: 0.0486284, 32768: 0.051598, 65536: 0.064822}
    headline_impl = "fused" if on_tpu else "xla"
    detail = {
        "device": str(dev),
        "backend": jax.default_backend(),
        "headline_impl": headline_impl,
        "ntt_amortized_ms_per_transform": results,
        "baseline_ms_bundle512": baseline_ms,
        "baseline_ms_bundle1": baseline_b1_ms,
        "gate_and_relin_modswitch_ms": None,
        "complete": False,
    }
    details_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_details.json")

    def write_details():
        with open(details_path, "w") as f:
            json.dump(detail, f, indent=2)

    headline_printed = []

    def print_headline(force=False):
        """Emit the ONE stdout JSON line as soon as the headline point
        exists (idempotent, so a timed-out run still parses).  force=True
        re-prints it as the process's LAST stdout line on the failure path
        — if a crash (e.g. a Mosaic lowering error) interleaved diagnostics
        into stdout, a parser reading the final line still gets the JSON
        (r4: the crash run ended with parsed=null despite the early
        print).  A clean run prints exactly one line."""
        if (headline_printed and not force) or \
                512 not in results.get("ntt16k", {}):
            return
        ours = results["ntt16k"][512]
        print(json.dumps({
            "metric": "ntt16k_amortized_latency_bundle512",
            "value": round(ours * 1e3, 4),   # microseconds per 16k NTT
            "unit": "us",
            "vs_baseline": round(baseline_ms[16384] / ours, 3),
        }), flush=True)
        headline_printed.append(True)

    def fori_viable() -> bool:
        """Probe whether lax.fori_loop programs compile on this backend.

        The axon tunnel's FIRST while-loop compile in a process has been
        observed to take 0.5-13 minutes (subsequent ones ~2s; cache hits
        skip it entirely) — usually because a previous client process
        still holds the tunnel device.  Compile in a daemon thread; wait
        up to CUHE_FORI_PROBE_S (default 300 s — capped per VERDICT r3 so
        the probe can't eat the driver's whole budget) before falling
        back to dispatch-timed measurement."""
        import threading

        done = []

        def work():
            try:
                xp = jnp.ones((8, 128))
                fp = jax.jit(lambda v: lax.fori_loop(
                    0, 4, lambda i, c: c * 1.0001 + 0.5, v))
                np.asarray(fp(xp)[0, :1])
                done.append(True)
            except Exception:
                done.append(False)

        th = threading.Thread(target=work, daemon=True)
        t0 = time.time()
        th.start()
        cap = float(os.environ.get("CUHE_FORI_PROBE_S", "300"))
        while time.time() - t0 < cap:
            th.join(timeout=30)
            if done:
                break
            log(f"fori probe still compiling after {time.time()-t0:.0f}s"
                " (device likely held by a previous client); waiting...")
        log(f"fori probe took {time.time() - t0:.0f}s")
        return bool(done and done[0])

    USE_FORI = fori_viable()
    log(f"fori_loop viable: {USE_FORI}"
        + ("" if USE_FORI else " (dispatch-timed fallback)"))

    # ---- implementations under test -------------------------------------
    # Iteration adapter: the next input is the previous input XOR one scalar
    # read from the output.  This keeps a data dependency between iterations
    # (XLA cannot hoist the transform out of the loop) at ~zero adapter cost
    # -- the closest JAX-legal analogue of the reference's timing loop,
    # which re-launches the kernels on the SAME buffers with no glue at all
    # (tests/test_ntt.cu:73-97).
    def make_one(n, impl):
        def one(carry):
            if impl == "fused":  # shipped hot path: v2 Pallas, mat layout
                lo, hi = nk.ntt_fwd(carry, n, layout="mat")
            elif impl == "fused_std":
                lo, hi = nk.ntt_fwd(carry, n, layout="std")
            else:  # xla four-step (std order)
                lo, hi = ntt.ntt_fwd_batched(carry, n, chunk=8)
            s = lo.ravel()[0] ^ hi.ravel()[0]
            return carry ^ s

        return one

    def oracle_gate(n, impl):
        """DFT-oracle-check the exact implementation that will be timed."""
        xs = rng.integers(0, 1 << 31, size=(8, n // 2), dtype=np.uint32)
        if impl == "fused" or impl == "fused_std":
            got_pair = nk.ntt_fwd(jnp.asarray(xs), n, layout="mat")
            got_pair = nk.mat_to_std(got_pair, n)
        else:
            got_pair = jax.jit(
                lambda v: ntt.ntt_fwd_batched(v, n, chunk=8))(jnp.asarray(xs))
        got = modp.u64_from_pair(np.asarray(got_pair[0][5]),
                                 np.asarray(got_pair[1][5]))
        om = pow(hm.NTT_GEN, 65536 // n, hm.P)
        pw_t = ntt._pow_table(om, n).astype(object)
        j = np.arange(n // 2, dtype=np.int64)
        xo = xs[5].astype(object)
        for k in rng.integers(0, n, size=8):
            want = int((xo * pw_t[(j * int(k)) % n]).sum()) % hm.P
            assert int(got[int(k)]) == want, \
                f"NTT {n} ({impl}) oracle mismatch at k={k} -- bench aborted"
        log(f"ntt {n} ({impl}): oracle ok")

    def time_ntt(n, b, iters, impl):
        x = jnp.asarray(rng.integers(0, 1 << 31, size=(b, n // 2),
                                     dtype=np.uint32))
        one = make_one(n, impl)
        if USE_FORI:
            f = jax.jit(lambda v: lax.fori_loop(0, iters,
                                                lambda i, c: one(c), v))
            np.asarray(f(x)[0, :1])  # compile + warm
            times = []
            for _ in range(3):  # the device is shared/throttled
                t0 = time.perf_counter()
                np.asarray(f(x)[0, :1])
                times.append(time.perf_counter() - t0)
            return min(times) / iters, max(times) / iters
        # dispatch-timed fallback: K back-to-back async dispatches + one tiny
        # data fetch (block_until_ready does not block on the axon backend)
        f = jax.jit(one)
        np.asarray(f(x)[0, :1])
        k = max(2, min(8, iters))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = f(x)
            np.asarray(o[0, :1])
            times.append(time.perf_counter() - t0)
        return min(times) / k, max(times) / k

    def sweep(n, impl, bl, min_left=0):
        """Measure bundle points in priority order; returns early (keeping
        partial results) once the wall-time budget drops below min_left."""
        key = f"ntt{n // 1024}k" + ("" if impl == headline_impl
                                    else f"_{impl}")
        per_bundle = results.setdefault(key, {})
        per_bundle_max = results.setdefault(key + "_maxrep", {})
        for b in bl:
            if b in per_bundle:
                continue
            if min_left and left() < min_left and per_bundle:
                log(f"{key}: stopping sweep at b={b} "
                    f"({left():.0f}s of budget left)")
                break
            # a single synchronous jitted call + fetch costs ~25 ms through
            # the tunnel; amortize it below ~0.4 us/transform.  The
            # reference's cudaEvent timing likewise excludes host overhead.
            iters = max(128, min(512, 16384 // b))
            lo_t, hi_t = time_ntt(n, b, iters, impl)
            per_bundle[b] = lo_t / b * 1e3       # ms per transform (min)
            per_bundle_max[b] = hi_t / b * 1e3
        log(f"ntt {n} ({impl}): "
            + "  ".join(f"b{b}={per_bundle[b]*1e3:.2f}us"
                        for b in sorted(per_bundle)))

    # --- headline first: 16k oracle + the b512 point, then print ----------
    # (doc/Perf_NTT.txt:14's amortized number; a run that dies later still
    # has its stdout line.)
    oracle_gate(16384, headline_impl)
    sweep(16384, headline_impl, [512])
    print_headline()
    write_details()

    # --- ALL remaining correctness gates BEFORE any further timing --------
    # (VERDICT r4 item 7: a lowering regression must surface in minute one,
    # not after the sweep budget is spent.)  The forward oracles cover
    # ntt_fwd at each size; the on-TPU section checks every other
    # Mosaic-compiled kernel the gate pipeline runs (intt_modcrt,
    # icrt_to_raw_fused, ntt_fwd_digits) against the XLA path — the
    # reference gates the exact kernels it times (tests/test_ntt.cu:38-64).
    for n in (32768, 65536):
        oracle_gate(n, headline_impl)
    if on_tpu:
        from cuhe_tpu.ops import crt as crt_ops

        for n in (16384, 32768, 65536):
            b = 6
            x64 = rng.integers(0, hm.P, size=(b, n), dtype=np.uint64)
            lo = jnp.asarray((x64 & 0xFFFFFFFF).astype(np.uint32))
            hi = jnp.asarray((x64 >> 32).astype(np.uint32))
            pv = np.array([4294967291, 3, 65537, 7681, 0xFFF1, 12289],
                          np.uint32)[:b]
            mus = np.array([modp.barrett_mu(int(q)) for q in pv], np.uint64)
            mu = (jnp.asarray(mus[:, 0].astype(np.uint32)),
                  jnp.asarray(mus[:, 1].astype(np.uint32)))
            want = jax.jit(lambda v, p_, m0, m1: ntt.intt_modcrt(
                v, n, p_[:, None], (m0[:, None], m1[:, None])))(
                    (lo, hi), jnp.asarray(pv), mu[0], mu[1])
            got = nk.intt_modcrt(nk.std_to_mat((lo, hi), n), n,
                                 jnp.asarray(pv), mu, layout="mat")
            assert (np.asarray(got) == np.asarray(want)).all(), \
                f"intt_modcrt {n} on-TPU mismatch -- bench aborted"
            log(f"intt_modcrt {n}: on-TPU oracle ok")

        # fused ICRT vs the scan path (cuhe/Base.cu:880-924 contract), on
        # the gate-benchmark parameter set's real prime chain
        from cuhe_tpu.params import make_params
        pr = make_params(3, 2, 16, 50, 25, 8191)
        primes = np.array(pr.crt_primes, np.uint32)
        mus_np = np.array([modp.barrett_mu(int(q)) for q in primes],
                          np.uint64)
        mus2 = (mus_np[:, 0].astype(np.uint32), mus_np[:, 1].astype(np.uint32))
        q, mi, bi = pr.icrt_consts(0)
        words = pr.words_coeff(0)
        m_words = hm.ints_to_words([q], words)[:, 0]
        mi_words = np.stack([hm.ints_to_words([v], words)[:, 0] for v in mi])
        bi = np.array(bi, np.uint32)
        cr = jnp.asarray(np.stack([
            rng.integers(0, int(p), size=4096, dtype=np.uint64).astype(
                np.uint32) for p in primes]))
        want = jax.jit(lambda c: crt_ops.icrt_to_raw(
            c, jnp.asarray(primes),
            (jnp.asarray(mus2[0]), jnp.asarray(mus2[1])), jnp.asarray(bi),
            jnp.asarray(mi_words), jnp.asarray(m_words)))(cr)
        got = crt_ops.icrt_to_raw_fused(cr, primes, mus2,
                                        bi, mi_words, m_words)
        assert (np.asarray(got) == np.asarray(want)).all(), \
            "icrt_to_raw_fused on-TPU mismatch -- bench aborted"
        log("icrt_to_raw_fused: on-TPU oracle ok")

        # fused digit-windowed forward NTT vs extract_digit + XLA forward
        n = 16384
        w32, wdig = 4, 20
        raw = jnp.asarray(rng.integers(0, 1 << 32, size=(2, w32, n // 2),
                                       dtype=np.uint64).astype(np.uint32))
        got = nk.ntt_fwd_digits(raw, n, w=wdig, j0=1, c=3, layout="std")
        digits = jnp.stack([ntt.extract_digit(raw, wdig, j, w32)
                            for j in range(1, 4)])
        want = jax.jit(lambda d: ntt.ntt_fwd_batched(d, n, chunk=8))(digits)
        assert (np.asarray(got[0]) == np.asarray(want[0])).all() and \
               (np.asarray(got[1]) == np.asarray(want[1])).all(), \
            "ntt_fwd_digits on-TPU mismatch -- bench aborted"
        log("ntt_fwd_digits: on-TPU oracle ok")
    write_details()

    # --- priority baseline-comparison points ------------------------------
    # b512 (amortized, doc/Perf_NTT.txt:14) and b1 (latency, :5) per size
    # come right after the gates so a timed-out run still records every
    # vs-baseline number; the remaining bundle points fill in later.
    sweep(16384, headline_impl, [1])
    for n in (32768, 65536):
        sweep(n, headline_impl, [512, 1])
        write_details()

    # --- fused gate pipeline (AND + relin + modswitch) ---------------------
    gate = None
    try:
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = fn(*args)
        jax.block_until_ready(out)

        def body(i, carry):
            o = fn(carry, *args[1:])
            # output is CRT [b, pnum-1, n/2]; rebuild an NTT-shaped
            # [b, pnum, n] uint32 input to keep the chain going
            o = jnp.concatenate([o, o[:, :1]], axis=1)      # pnum planes
            return jnp.concatenate([o, o], axis=-1)         # length n
        # amortize the ~25 ms per-call tunnel round trip: at K=64 the floor
        # is still ~0.2 ms/ciphertext; K=256 brings it under 0.05 -- the
        # reference's cudaEvent timing excludes host overhead entirely
        K = 256
        if USE_FORI:
            g = jax.jit(lambda a: lax.fori_loop(0, K, body, a))
            np.asarray(g(args[0])[0, 0, :1])
            t0 = time.perf_counter()
            np.asarray(g(args[0])[0, 0, :1])
            gate = (time.perf_counter() - t0) / K / args[0].shape[0]
        else:
            jf = jax.jit(fn)
            np.asarray(jf(*args)[0, 0, :1])
            t0 = time.perf_counter()
            o = None
            for _ in range(K):
                o = jf(*args)
            np.asarray(o[0, 0, :1])
            gate = (time.perf_counter() - t0) / K / args[0].shape[0]
        log(f"fused AND+relin+modswitch (4 primes, 16k ring): "
            f"{gate*1e3:.3f} ms/ciphertext")
    except Exception as e:  # pragma: no cover
        log(f"gate pipeline bench skipped: {e}")
    detail["gate_and_relin_modswitch_ms"] = gate * 1e3 if gate else None
    write_details()

    # --- optional sections (skipped when the budget runs low) --------------
    # fill pass: the remaining bundle points of the reference's table
    for n in (16384, 32768, 65536):
        if left() < 120:
            log(f"skipping fill sweep n>={n}: {left():.0f}s left")
            break
        sweep(n, headline_impl, [256, 128, 64, 32, 16, 8, 4, 2],
              min_left=90)
        write_details()

    if on_tpu:
        if left() > 150:
            for n in (16384, 32768, 65536):
                if left() < 60:
                    log(f"skipping xla sweep n>={n}: "
                        f"{left():.0f}s of budget left")
                    break
                oracle_gate(n, "xla")
                sweep(n, "xla", [512, 1, 64], min_left=45)
                write_details()
        else:
            log(f"skipping xla comparison sweeps: {left():.0f}s left")

    if left() > 30:
        # headline re-measure at end of run (throttle-drift detection)
        lo_t, hi_t = time_ntt(16384, 512, 128, headline_impl)
        results["ntt16k_remeasure"] = {512: lo_t / 512 * 1e3}
        log(f"ntt 16k headline re-measure: {lo_t/512*1e6:.2f} us")
    else:
        log(f"skipping end-of-run re-measure: {left():.0f}s left")

    detail["complete"] = True
    write_details()
    print_headline()   # no-op unless somehow unreached above
    log(f"bench complete in {time.time()-T_START:.0f}s")


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        # failure path: keep rc != 0 (a broken kernel must fail the bench)
        # but make the LAST stdout line the headline JSON if it was ever
        # measured, so the driver's parse survives interleaved diagnostics
        import traceback

        traceback.print_exc(file=sys.stderr)
        try:
            details = json.load(open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "bench_details.json")))
            pt = details["ntt_amortized_ms_per_transform"]["ntt16k"]["512"]
            print(json.dumps({
                "metric": "ntt16k_amortized_latency_bundle512",
                "value": round(pt * 1e3, 4), "unit": "us",
                "vs_baseline": round(
                    details["baseline_ms_bundle512"]["16384"] / pt, 3),
            }), flush=True)
        except Exception:
            pass
        sys.exit(1)
