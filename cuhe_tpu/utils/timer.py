"""Wall-clock timing + profiling helpers.

Equivalent of the reference's otimer (examples/Prince/Timer.{h,cu}) plus a
thin wrapper over jax.profiler for TPU traces (the reference had no systemic
profiler; SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import time


class OTimer:
    """start/stop/show wall-clock milliseconds (Timer.cu:9-23)."""

    def __init__(self):
        self._t0 = None
        self._ms = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._ms += (time.perf_counter() - self._t0) * 1e3
            self._t0 = None

    def show(self, label: str = ""):
        print(f"{label}\t{self._ms:.3f} ms")

    @property
    def ms(self) -> float:
        return self._ms


@contextlib.contextmanager
def timed(label: str):
    t0 = time.perf_counter()
    yield
    print(f"{label}: {(time.perf_counter() - t0) * 1e3:.3f} ms")


@contextlib.contextmanager
def tpu_trace(logdir: str):
    """Capture a jax.profiler trace around a block (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
