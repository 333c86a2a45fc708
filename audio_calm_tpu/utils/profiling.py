"""Profiling / tracing utilities.

The reference's only instrumentation is a one-shot thop FLOPs probe
(train_calm.py:521-567). TPU-native equivalents:
  - flops_estimate: XLA's own cost analysis on the lowered computation
  - trace: jax.profiler context writing an xprof-compatible trace
  - step_timer: steps/sec + device-time summaries for train loops
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


def flops_estimate(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile fn and return XLA cost analysis (flops, bytes accessed).

    Replaces the reference's thop probe; exact for the compiled program
    rather than a per-module estimate.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
        "utilization_hint": float(cost.get("utilization operand 0 {}", -1)),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """xprof-compatible profiler trace: `with trace('/tmp/tb'): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock steps/sec with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n = 0
        self.t0: Optional[float] = None

    def tick(self, result: Any = None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        self.n += 1
        if self.n == self.warmup:
            self.t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self.t0 is None or self.n <= self.warmup:
            return float("nan")
        return (self.n - self.warmup) / (time.perf_counter() - self.t0)
