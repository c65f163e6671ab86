"""Device calibration probe: MXU int8 vs bf16 dot rate + VPU u32 op rate.

Establishes the per-phase speed-of-light numbers the kernel optimization is
steering against (PERF.md).  Run: python scripts/tpu_probe_calib.py
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
from jax.experimental import pallas as pl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(f, *args, k=8, reps=3):
    o = f(*args)
    np.asarray(o.ravel()[:1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            o = f(*args)
        np.asarray(o.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best / k


def dot_kernel(dtype, acc, reps):
    # NOTE: Mosaic has no i8 elementwise vector ops ("only vector<i16>/<i32>
    # supported"), so repetition happens via the grid, not input mutation.
    def kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc)

    return kernel


def bench_dot(m, k, n, dtype, acc, reps=1, grid=64):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = rng.integers(-100, 100, size=(m, k)).astype(np.int8)
        w = rng.integers(-100, 100, size=(k, n)).astype(np.int8)
    else:
        x = rng.standard_normal((m, k)).astype(np.float32)
        w = rng.standard_normal((k, n)).astype(np.float32)
        x = x.astype(jnp.bfloat16 if dtype == jnp.bfloat16 else np.float32)
        w = w.astype(jnp.bfloat16 if dtype == jnp.bfloat16 else np.float32)
    f = jax.jit(lambda xx, ww: pl.pallas_call(
        dot_kernel(dtype, acc, reps),
        grid=(grid,),
        in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), acc),
    )(xx, ww))
    dt = timeit(f, jnp.asarray(x), jnp.asarray(w))
    flops = 2.0 * m * k * n * reps * grid
    log(f"dot {dtype.__name__}[{m}x{k}x{n}]x{reps}x{grid}: {dt*1e3:.2f} ms"
        f" -> {flops/dt/1e12:.1f} Tops/s")


def vpu_kernel(reps):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        y = x
        for _ in range(reps):
            y = (y + x) ^ (y >> jnp.uint32(3))
        o_ref[...] = y

    return kernel


def bench_vpu(rows, cols, reps=64, grid=8):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 32, size=(rows, cols), dtype=np.uint64)
    x = jnp.asarray(x.astype(np.uint32))
    f = jax.jit(lambda xx: pl.pallas_call(
        vpu_kernel(reps),
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, cols), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rows, cols), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.uint32),
    )(xx))
    dt = timeit(f, x)
    ops = 3.0 * rows * cols * reps * grid  # add, shift, xor per rep
    log(f"vpu u32[{rows}x{cols}]x{reps}x{grid}: {dt*1e3:.2f} ms"
        f" -> {ops/dt/1e12:.2f} T u32-ops/s")


def main():
    log(f"device: {jax.devices()[0]}")
    bench_dot(1024, 128, 1024, jnp.int8, jnp.int32)
    bench_dot(1024, 128, 1024, jnp.bfloat16, jnp.float32)
    bench_dot(1024, 1024, 1024, jnp.int8, jnp.int32)
    bench_dot(1024, 1024, 1024, jnp.bfloat16, jnp.float32)
    bench_dot(128, 128, 128, jnp.int8, jnp.int32)
    bench_vpu(512, 1024)
    bench_vpu(1024, 1024)


if __name__ == "__main__":
    main()
