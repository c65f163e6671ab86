"""Benchmark suite: regenerates the reference's NTT bundle-throughput table
(doc/Perf_NTT.txt, produced by tests/test_ntt.cu) on TPU, with a built-in
correctness gate, plus higher-level op benchmarks.

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
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    import jax
    import jax.numpy as jnp

    try:
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

    # --- NTT bundle sweep (cf. tests/test_ntt.cu:103-138) -----------------
    # reference baselines (doc/Perf_NTT.txt): amortized ms per NTT at bundle 512
    baseline_ms = {16384: 0.00407564, 32768: 0.00804859, 65536: 0.0226647}
    bundles = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]
    total = 1024  # like #define cnt in test_ntt.cu:33

    for n in (16384, 32768, 65536):
        x_all = rng.integers(0, 1 << 31, size=(512, n // 2), dtype=np.uint32)
        chunk = max(1, min(32, (1 << 28) // (64 * n * 4)))
        fn = jax.jit(lambda v: ntt.ntt_fwd_batched(v, n, chunk=chunk))

        # correctness gate: check one transform against the DFT oracle
        out = fn(jnp.asarray(x_all[:8]))
        got = modp.u64_from_pair(np.asarray(out[0][5]), np.asarray(out[1][5]))
        om = pow(hm.NTT_GEN, 65536 // n, hm.P)
        pw_t = ntt._pow_table(om, n).astype(object)
        ks = rng.integers(0, n, size=8)
        xo = x_all[5].astype(object)
        j = np.arange(n // 2, dtype=np.int64)
        for k in ks:
            want = int((xo * pw_t[(j * int(k)) % n].astype(object)).sum()) % hm.P
            assert int(got[int(k)]) == want, f"NTT {n} mismatch at k={k}"
        log(f"ntt {n}: correctness ok")

        per_bundle = {}
        for b in bundles:
            x = jnp.asarray(x_all[:b])
            f = jax.jit(lambda v: ntt.ntt_fwd_batched(v, n, chunk=chunk))
            r = f(x)
            jax.block_until_ready(r)
            iters = max(1, total // b)
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(x)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / (iters * b)
            per_bundle[b] = dt * 1e3  # ms per transform
        results[f"ntt{n // 1024}k"] = per_bundle
        log(f"ntt {n}: " + "  ".join(f"b{b}={per_bundle[b]*1e3:.2f}us"
                                     for b in bundles))

    # --- summary table to stderr + BENCH details file ---------------------
    detail = {
        "device": str(dev),
        "backend": jax.default_backend(),
        "ntt_amortized_ms": results,
        "baseline_ms_bundle512": baseline_ms,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_details.json"), "w") as f:
        json.dump(detail, f, indent=2)

    ours = results["ntt16k"][512]
    base = baseline_ms[16384]
    print(json.dumps({
        "metric": "ntt16k_amortized_latency_bundle512",
        "value": round(ours * 1e3, 4),   # microseconds per 16k NTT
        "unit": "us",
        "vs_baseline": round(base / ours, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
