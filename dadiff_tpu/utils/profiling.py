"""Profiling + metrics instrumentation.

The reference has no profiling at all (SURVEY.md §5: 'no profiler hooks,
timers, or trace exports anywhere'). TPU-native equivalents:

  * ``trace(dir)`` — jax.profiler context producing a TensorBoard-loadable
    XPlane trace of device execution,
  * ``StepTimer`` — throughput counters (steps/s, samples/s) with warmup
    discard and jitter-robust percentiles,
  * ``annotate`` — named TraceAnnotation ranges visible in the trace viewer.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): step()``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range in the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with warmup discard.

    Usage:
        timer = StepTimer(warmup=2)
        for batch in loader:
            with timer.step(n_samples=batch_size):
                state, _ = train_step(state, batch, key)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._samples: List[int] = []

    @contextlib.contextmanager
    def step(self, n_samples: int = 1):
        t0 = time.perf_counter()
        yield
        self._times.append(time.perf_counter() - t0)
        self._samples.append(n_samples)

    @property
    def times(self) -> List[float]:
        return self._times[self.warmup:]

    def summary(self) -> Dict[str, float]:
        times = self.times
        if not times:
            return {}
        samples = self._samples[self.warmup:]
        total = sum(times)
        return {
            "steps_per_sec": len(times) / total,
            "samples_per_sec": sum(samples) / total,
            "mean_ms": 1000 * total / len(times),
            "median_ms": 1000 * statistics.median(times),
            "p90_ms": 1000 * sorted(times)[int(0.9 * (len(times) - 1))],
        }


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Per-device memory stats when the backend exposes them."""
    import jax

    dev = jax.devices()[0]
    if hasattr(dev, "memory_stats"):
        try:
            return dev.memory_stats()
        except Exception:
            return None
    return None
