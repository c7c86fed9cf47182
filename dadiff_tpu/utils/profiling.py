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

    JAX dispatch is asynchronous: the ``step`` context only measures what
    the enclosed code blocks on, so either block inside it or use
    :meth:`timed_call`, which blocks on the callable's outputs for you.

    Usage:
        timer = StepTimer(warmup=2)
        for batch in loader:
            state, metrics = timer.timed_call(
                train_step, state, batch, key, n_samples=batch_size
            )
        print(timer.summary())
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._samples: List[int] = []

    @contextlib.contextmanager
    def step(self, n_samples: int = 1):
        """Raw context timer — the caller must block (e.g.
        ``jax.block_until_ready(out)``) inside the block, or the time
        recorded is dispatch latency, not device step time."""
        t0 = time.perf_counter()
        yield
        self._times.append(time.perf_counter() - t0)
        self._samples.append(n_samples)

    def timed_call(self, fn, *args, n_samples: int = 1, **kwargs):
        """Call ``fn`` and time until its outputs are READY (blocks on the
        returned pytree — correct under async dispatch)."""
        import jax

        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self._times.append(time.perf_counter() - t0)
        self._samples.append(n_samples)
        return out

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


def device_memory_stats() -> Optional[Dict[str, Dict[str, int]]]:
    """Memory stats for EVERY device (an unbalanced shard can OOM a device
    this function would miss if it only looked at device 0)."""
    import jax

    out = {}
    for dev in jax.devices():
        if hasattr(dev, "memory_stats"):
            try:
                out[str(dev)] = dev.memory_stats()
            except Exception:
                continue
    return out or None
