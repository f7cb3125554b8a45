"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md §5: closest artifact is
MetricLogger's iteration timing).  Here:

* :func:`trace`: context manager around `jax.profiler` emitting a
  TensorBoard-loadable trace (set ``PODTPU_TRACE_DIR`` or pass a path);
* :func:`annotate`: named trace spans (`jax.profiler.TraceAnnotation`) for
  host-side phases;
* :class:`StepTimer`: wall-clock percentile tracking for steady-state step
  latency (p50/p90), used for the tiles/sec style reporting;
* :func:`slope_time`: remote-link-safe micro-benchmark timing (run N_small
  vs N_large iterations, divide the difference — cancels the per-call RPC
  latency of tunneled TPU setups, where ``block_until_ready`` does not
  actually block).  The single implementation behind every tools/ script.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import List, Optional

import jax


def slope_time(fn, iters=(2, 12), reps=2) -> float:
    """Seconds per iteration of ``fn`` by the slope method.

    ``fn(i)`` is called with the iteration index and must return something
    fetchable (a jax array / pytree); the result is fetched to the host
    once per run to force execution.  Timing = min over ``reps`` of
    ``(t[iters[1]] - t[iters[0]]) / (iters[1] - iters[0])``, which cancels
    both dispatch and link round-trip latency.
    """
    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(i)
        jax.tree.leaves(jax.device_get(out))  # force
        return time.perf_counter() - t0

    run(1)  # compile
    t_short = min(run(iters[0]) for _ in range(reps))
    t_long = min(run(iters[1]) for _ in range(reps))
    return max((t_long - t_short) / (iters[1] - iters[0]), 1e-9)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a device+host profiler trace if a log dir is configured."""
    log_dir = log_dir or os.environ.get("PODTPU_TRACE_DIR")
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
    print(f"[podtpu] profiler trace written to {log_dir}")


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step latencies with percentile summaries."""

    def __init__(self, skip_first: int = 3):
        self.skip_first = skip_first
        self._all: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._all.append(time.perf_counter() - self._t0)

    @property
    def steady(self) -> List[float]:
        return self._all[self.skip_first:] if len(self._all) > self.skip_first \
            else self._all

    def percentile(self, q: float) -> float:
        xs = sorted(self.steady)
        if not xs:
            return 0.0
        idx = min(int(q / 100.0 * len(xs)), len(xs) - 1)
        return xs[idx]

    @property
    def p50(self) -> float:
        return self.percentile(50)

    @property
    def p90(self) -> float:
        return self.percentile(90)

    def summary(self, unit_per_step: float = 1.0, unit: str = "items") -> str:
        p50 = self.p50
        rate = unit_per_step / p50 if p50 > 0 else 0.0
        return (f"p50 {p50 * 1000:.1f} ms, p90 {self.p90 * 1000:.1f} ms, "
                f"{rate:.1f} {unit}/s")
