"""Benchmark suite: regenerates the reference's NTT bundle-throughput table
(doc/Perf_NTT.txt, produced by tests/test_ntt.cu) on TPU, with a built-in
correctness gate, plus the fused gate-pipeline benchmark.

Timing methodology: the iteration loop lives INSIDE the jitted computation
(lax.fori_loop with a data dependency chained between iterations), so one
dispatch + one scalar fetch brackets K full transforms.  This removes host
dispatch / tunnel-latency noise, mirroring the reference's cudaEvent timing
around a launch burst (tests/test_ntt.cu:67-100).

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
    from cuhe_tpu.ops import modp, ntt

    dev = jax.devices()[0]
    log(f"backend: {jax.default_backend()}, device: {dev}")

    rng = np.random.default_rng(20260817)
    results = {}
    CHUNK = 8

    def fori_viable() -> bool:
        """Probe whether lax.fori_loop programs compile on this backend.

        The axon tunnel's FIRST while-loop compile in a process has been
        observed to take ~7 minutes (subsequent ones ~2s), and in bad
        sessions to hang indefinitely, while plain jit programs compile in
        seconds.  Compile in a daemon thread with a deadline: on success the
        process itself is warmed for all later fori compiles; on deadline we
        fall back to dispatch-timed measurement (the XLA compile holds no
        GIL, so the main thread continues safely)."""
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
        th.join(timeout=540)
        log(f"fori probe took {time.time() - t0:.0f}s")
        return bool(done and done[0])

    USE_FORI = fori_viable()
    log(f"fori_loop viable: {USE_FORI}"
        + ("" if USE_FORI else " (dispatch-timed fallback)"))

    def time_ntt(n, b, iters, impl="xla"):
        half = n // 2
        x = jnp.asarray(rng.integers(0, 1 << 31, size=(b, half),
                                     dtype=np.uint32))

        def one(carry):
            if impl == "pallas":
                from cuhe_tpu.ops import pallas_kernels as pk

                tile = {16384: 4, 32768: 2, 65536: 1}[n]
                lo, hi = pk.ntt_fwd_pallas(carry, n, tile=min(tile, b))
            else:
                lo, hi = ntt.ntt_fwd_batched(carry, n, chunk=CHUNK)
            return lo[..., :half] ^ hi[..., :half]

        if USE_FORI:
            f = jax.jit(lambda v: lax.fori_loop(0, iters,
                                                lambda i, c: one(c), v))
            np.asarray(f(x)[0, :1])  # compile + warm
            best = float("inf")
            for _ in range(3):  # min-of-3: the device is shared/throttled
                t0 = time.perf_counter()
                np.asarray(f(x)[0, :1])
                best = min(best, time.perf_counter() - t0)
            return best / iters  # seconds per bundle of b transforms
        # dispatch-timed fallback: K back-to-back async dispatches, then one
        # tiny DATA FETCH of the last output (device queues are FIFO, so the
        # fetch bounds all K executions).  block_until_ready alone does NOT
        # block on the axon tunnel backend; only a fetch synchronizes.
        f = jax.jit(one)
        np.asarray(f(x)[0, :1])
        k = max(2, min(8, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = f(x)
            np.asarray(o[0, :1])
            best = min(best, time.perf_counter() - t0)
        return best / k

    # --- NTT bundle sweep --------------------------------------------------
    baseline_ms = {16384: 0.00407564, 32768: 0.00804859, 65536: 0.0226647}
    baseline_b1_ms = {16384: 0.0486284, 32768: 0.051598, 65536: 0.064822}
    bundles = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]

    for n in (16384, 32768, 65536):
        # correctness gate (bundle element #5 vs DFT oracle, random indices)
        xs = rng.integers(0, 1 << 31, size=(8, n // 2), dtype=np.uint32)
        out = jax.jit(lambda v: ntt.ntt_fwd_batched(v, n, chunk=CHUNK))(
            jnp.asarray(xs))
        got = modp.u64_from_pair(np.asarray(out[0][5]), np.asarray(out[1][5]))
        om = pow(hm.NTT_GEN, 65536 // n, hm.P)
        pw_t = ntt._pow_table(om, n).astype(object)
        j = np.arange(n // 2, dtype=np.int64)
        xo = xs[5].astype(object)
        for k in rng.integers(0, n, size=8):
            want = int((xo * pw_t[(j * int(k)) % n]).sum()) % hm.P
            assert int(got[int(k)]) == want, f"NTT {n} mismatch at k={k}"
        log(f"ntt {n}: correctness ok")

        per_bundle = {}
        for b in bundles:
            iters = max(4, min(256, 2048 // b))
            dt = time_ntt(n, b, iters)
            per_bundle[b] = dt / b * 1e3  # ms per transform
        results[f"ntt{n // 1024}k"] = per_bundle
        # also record the alternate XLA matmul path at the headline bundle
        # (CUHE_NTT_I8 toggles int8-banded vs bf16-limb stage matmuls)
        try:
            cur = os.environ.get("CUHE_NTT_I8", "1")
            alt = "0" if cur == "1" else "1"
            os.environ["CUHE_NTT_I8"] = alt
            dt_alt = time_ntt(n, 512, max(4, min(256, 2048 // 512)))
            name = "bf16" if alt == "0" else "i8"
            results[f"ntt{n // 1024}k_alt_{name}"] = {512: dt_alt / 512 * 1e3}
            log(f"ntt {n} (alt {name}): b512="
                f"{dt_alt / 512 * 1e6:.2f}us")
        finally:
            os.environ["CUHE_NTT_I8"] = cur
        log(f"ntt {n} (xla): " + "  ".join(f"b{b}={per_bundle[b]*1e3:.2f}us"
                                           for b in bundles))
        if jax.default_backend() == "tpu":
            try:
                pall = {}
                for b in (1, 8, 64, 512):
                    iters = max(4, min(128, 1024 // b))
                    pall[b] = time_ntt(n, b, iters, impl="pallas") / b * 1e3
                results[f"ntt{n // 1024}k_pallas"] = pall
                log(f"ntt {n} (pallas): "
                    + "  ".join(f"b{b}={pall[b]*1e3:.2f}us" for b in pall))
            except Exception as e:
                log(f"pallas ntt {n} skipped: {e}")

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

        K = 16
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

    detail = {
        "device": str(dev),
        "backend": jax.default_backend(),
        "ntt_amortized_ms_per_transform": results,
        "baseline_ms_bundle512": baseline_ms,
        "baseline_ms_bundle1": baseline_b1_ms,
        "gate_and_relin_modswitch_ms": gate * 1e3 if gate else None,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_details.json"), "w") as f:
        json.dump(detail, f, indent=2)

    ours = results["ntt16k"][512]
    if "ntt16k_pallas" in results:
        ours = min(ours, results["ntt16k_pallas"][512])
    for k in ("ntt16k_alt_bf16", "ntt16k_alt_i8"):
        if k in results:
            ours = min(ours, results[k][512])
    base = baseline_ms[16384]
    print(json.dumps({
        "metric": "ntt16k_amortized_latency_bundle512",
        "value": round(ours * 1e3, 4),   # microseconds per 16k NTT
        "unit": "us",
        "vs_baseline": round(base / ours, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
