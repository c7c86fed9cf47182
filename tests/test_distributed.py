"""Multi-host init helpers (single-host no-op path)."""

from dadiff_tpu.parallel.distributed import (
    initialize_distributed,
    is_primary_host,
    local_device_count,
)


def test_single_host_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False


def test_primary_host_and_devices():
    assert is_primary_host() is True
    assert local_device_count() == 8  # conftest's virtual CPU mesh
