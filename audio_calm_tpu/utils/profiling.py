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


def lowered_flops(fn: Callable, *args, **kwargs) -> float:
    """FLOPs of fn on the given (possibly abstract ShapeDtypeStruct) args,
    from the pre-compile lowering — no executable is built, so probing a
    geometry that would OOM (or cost a multi-minute remote TPU compile) is
    safe. Counts the unoptimized HLO; matmul-dominated programs match the
    compiled count to ~1%. NOTE: a lax.scan body is counted ONCE regardless
    of trip count — probe scan-free variants (e.g. microbatch=1) instead.
    """
    cost = jax.jit(fn).lower(*args, **kwargs).cost_analysis()
    if cost is None:
        # some PJRT plugins (axon TPU) have no pre-compile cost analysis;
        # FLOP counts are backend-independent, so lower for CPU instead
        cpu = jax.devices("cpu")[0]
        abstract = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (args, kwargs)
        )
        a2, kw2 = abstract
        cost = jax.jit(fn, device=cpu).lower(*a2, **kw2).cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0))


# bf16 peak FLOP/s per chip, by jax device_kind substring (public specs).
_PEAK_BF16 = (
    ("v5 lite", 197e12),  # v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v6 lite", 918e12),  # v6e / Trillium
    ("v6e", 918e12),
    ("v4", 275e12),
)


def device_peak_flops(device=None) -> Optional[float]:
    """Per-chip bf16 peak FLOP/s for MFU math, or None when unknown (CPU)."""
    device = device or jax.devices()[0]
    kind = device.device_kind.lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return None


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
