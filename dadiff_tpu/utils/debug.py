"""Numerical-anomaly detection and debugging aids.

The reference has no sanitizers or failure detection (SURVEY.md §5); its only
knobs are cudnn determinism flags. JAX is deterministic by construction;
what remains worth guarding is numerical health of the fused train step.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


def check_finite_pytree(tree: Any, name: str = "pytree") -> List[str]:
    """Host-side audit: returns the paths of non-finite leaves (empty = ok)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jax.device_get(leaf)
        if hasattr(arr, "dtype") and jnp.issubdtype(arr.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(arr))):
                bad.append(f"{name}{jax.tree_util.keystr(path)}")
    return bad


def tree_all_finite(tree: Any) -> jax.Array:
    """jit-side scalar bool: every leaf of ``tree`` is finite."""
    finite = jnp.array(True)
    for leaf in jax.tree_util.tree_leaves(tree):
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))
    return finite


def finite_or_skip(grads: Any) -> Tuple[Any, jax.Array]:
    """jit-side guard: returns (grads_or_zeros, all_finite_flag).

    Composable into the train step so a single bad batch skips the update
    instead of poisoning parameters — cheap elastic-recovery for long runs.
    """
    finite = tree_all_finite(grads)
    safe = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
    )
    return safe, finite


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax NaN debugging (recompiles with checks; slow — debug only)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
