"""Native checkpoint format (orbax) for full train state.

The reference persists torch .pt dicts (training.py:191-224); our native
format is an orbax PyTree checkpoint (async-capable, TPU-sharding-aware) plus
a JSON metadata sidecar. The .pt interop path lives in torch_compat.py.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_native(path: str, state, config: Dict[str, Any], epoch: int = 0) -> str:
    """Save train state under ``path.orbax/`` with ``path.meta.json`` sidecar."""
    ocp = _ocp()
    ckpt_dir = os.path.abspath(path + ".orbax")
    with ocp.PyTreeCheckpointer() as checkpointer:
        checkpointer.save(ckpt_dir, jax.device_get(state), force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump({"config": config, "epoch": epoch}, f, indent=2)
    return ckpt_dir


def restore_native(path: str, target) -> Tuple[Any, Dict[str, Any]]:
    """Restore a train state saved by :func:`save_native`.

    Args:
        path: base path (without .orbax suffix) or the .orbax dir itself.
        target: template pytree with the right structure/shapes.
    """
    ocp = _ocp()
    base = path[:-len(".orbax")] if path.endswith(".orbax") else path
    ckpt_dir = os.path.abspath(base + ".orbax")
    with ocp.PyTreeCheckpointer() as checkpointer:
        try:
            state = checkpointer.restore(ckpt_dir, item=jax.device_get(target))
        except ValueError:
            # Checkpoints from EMA-less trainers (e.g. the progressive-
            # distillation rounds) store ema_params as a None leaf; a
            # template carrying a full EMA tree then fails the structure
            # match. Retry with the optional subtree dropped.
            if not (hasattr(target, "replace")
                    and hasattr(target, "ema_params")):
                raise
            fallback = target.replace(ema_params=None)
            state = checkpointer.restore(
                ckpt_dir, item=jax.device_get(fallback)
            )
    meta: Dict[str, Any] = {}
    meta_path = base + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
