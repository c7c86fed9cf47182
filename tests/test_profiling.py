"""Profiling utilities tests."""

import time

from dadiff_tpu.utils.profiling import StepTimer, annotate, device_memory_stats


def test_step_timer_summary():
    timer = StepTimer(warmup=1)
    for _ in range(5):
        with timer.step(n_samples=4):
            time.sleep(0.01)
    s = timer.summary()
    assert s["steps_per_sec"] > 0
    assert s["samples_per_sec"] == 4 * s["steps_per_sec"]
    assert 5 <= s["median_ms"] < 100
    assert len(timer.times) == 4  # warmup discarded


def test_annotate_context():
    with annotate("test-range"):
        pass


def test_device_memory_stats_no_crash():
    device_memory_stats()  # may be None on CPU; must not raise
