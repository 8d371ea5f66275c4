"""Metrics, profiling, and debug instrumentation.

The reference's observability is ad-hoc `std::chrono` wall-clock logging and
Ceres brief reports (SURVEY.md §5). Here it is a small subsystem:

- `Counters`: throughput counters (events/s, frames/s, solves/s) with
  windowed rates — the quantities `BASELINE.json` tracks;
- `timed`: scoped wall-clock timer (the `steady_clock` pattern of
  `optimizer.cpp:69-70,118-125`) feeding named accumulators;
- `profile_trace`: context manager around `jax.profiler` for device traces;
- `enable_nan_canary`: runtime equivalent of the reference's
  `-DEIGEN_INITIALIZE_MATRICES_BY_NAN` debug poisoning
  (`CMakeLists.txt:57-58`) via `jax_debug_nans`.
"""

from __future__ import annotations

import collections
import contextlib
import time


class Counters:
    def __init__(self):
        self._t0 = time.perf_counter()
        self.counts: collections.Counter = collections.Counter()
        self.times: collections.defaultdict = collections.defaultdict(float)
        self.calls: collections.Counter = collections.Counter()

    def add(self, name: str, n: int = 1) -> None:
        self.counts[name] += n

    def rate(self, name: str) -> float:
        dt = time.perf_counter() - self._t0
        return self.counts[name] / dt if dt > 0 else 0.0

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def summary(self) -> dict:
        dt = time.perf_counter() - self._t0
        out = {"wall_s": round(dt, 3)}
        for k, v in self.counts.items():
            out[k] = v
            out[f"{k}_per_s"] = round(v / dt, 2) if dt > 0 else 0.0
        for k, v in self.times.items():
            out[f"time_{k}_s"] = round(v, 3)
            out[f"calls_{k}"] = self.calls[k]
        return out


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_canary() -> None:
    """Fail loudly on any NaN produced under jit (debug runs only)."""
    import jax

    jax.config.update("jax_debug_nans", True)


GLOBAL = Counters()
