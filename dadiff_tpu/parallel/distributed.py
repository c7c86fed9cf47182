"""Multi-host initialization (new capability; reference is single-process).

On a multi-host TPU slice each host runs the same program; call
``initialize_distributed()`` before any jax computation. On single-host
setups it is a no-op, so framework code can call it unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: Optional[bool] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    On a Cloud TPU pod slice none of those env vars is set — jax
    autodetects peers from the TPU metadata server when ``initialize()``
    is called with no arguments. That path must be requested explicitly
    (``auto=True`` or env ``DADIFF_DIST_AUTO=1``) because calling it on a
    plain single host raises. Returns True if a multi-process runtime was
    initialized."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if auto is None:
        auto = os.environ.get("DADIFF_DIST_AUTO", "0") == "1"

    if coordinator_address is None and num_processes is None:
        if auto:
            jax.distributed.initialize()  # TPU-pod metadata autodetection
            return jax.process_count() > 1
        return False  # single host

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    value = os.environ.get(name)
    return int(value) if value is not None else None


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0


def local_device_count() -> int:
    import jax

    return jax.local_device_count()
