"""Tracing / profiling utilities (SURVEY.md section 5.1).

The reference had only ad-hoc wall-clock timing (TimerContext,
advanced_metrics.py:231-255; per-batch eval timing, testing.py:163-178).
TPU-native equivalents here:
  * :class:`StageTimer` — per-stage wall-clock accounting with device sync,
    producing the same `inference_time` / faces-per-sec metric shapes.
  * :func:`trace` — context manager around ``jax.profiler`` trace capture
    (view in TensorBoard / xprof).
  * :func:`timed_call` — salt-aware steady-state timing that defeats the
    runtime's identical-input execution cache (see serve/pipeline.benchmark).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path
from typing import Any, Callable

import jax


class StageTimer:
    """Accumulate wall time per named stage; blocks on device results so TPU
    async dispatch doesn't hide work."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result: Any = None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            out = box.get("result", result)
            if out is not None:
                jax.block_until_ready(out)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_sec": v, "count": self.counts[k],
                "mean_ms": 1000 * v / max(self.counts[k], 1)}
            for k, v in self.totals.items()
        }


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/facerec_trace"):
    """Capture a jax.profiler trace for TensorBoard."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield Path(log_dir)
    finally:
        jax.profiler.stop_trace()


def timed_call(fn: Callable, *args, iters: int = 10, salt_arg: int | None = 0) -> dict[str, float]:
    """Steady-state timing of a jitted fn. When ``salt_arg`` is an int, that
    positional argument is perturbed per iteration (pass a float/array there)
    so every call is a distinct execution — identical-input calls can be
    served from an execution cache and time as ~0."""
    import jax.numpy as jnp

    args = list(args)
    base = args[salt_arg] if salt_arg is not None else None

    def call(i: int):
        if salt_arg is not None:
            args[salt_arg] = base + jnp.asarray(float(i), getattr(base, "dtype", jnp.float32))
        return fn(*args)

    jax.block_until_ready(call(iters + 1))  # compile/warm
    t0 = time.perf_counter()
    outs = [call(i) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_sec": dt, "mean_ms": dt * 1000, "iters": iters}
