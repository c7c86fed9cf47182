"""Array utilities (TPU-native analogue of reference m_diffuser/utils/arrays.py:10-156).

The reference shuttles tensors across the host<->CUDA boundary every step
(`to_torch`/`to_device`). On TPU the analogue is ``jax.device_put`` with an
optional sharding; most code here is pure numpy/jnp conversion plus seeding.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Union

import numpy as np
import jax
import jax.numpy as jnp

Array = Union[np.ndarray, jax.Array]


def to_jnp(x: Any, dtype=jnp.float32, sharding=None) -> jax.Array:
    """Convert to a device array (reference `to_torch`, arrays.py:10-29).

    Args:
        x: numpy array / python scalar / jax array.
        dtype: target dtype (defaults to float32, matching the reference).
        sharding: optional ``jax.sharding.Sharding`` for multi-device placement.
    """
    if sharding is not None:
        # device_put straight from host memory: uploading each shard to its
        # own device. jnp.asarray first would commit the FULL array to the
        # default device before resharding (redundant transfer, and OOM for
        # batches larger than one device's memory).
        if isinstance(x, jax.Array):
            return jax.device_put(x.astype(dtype) if dtype else x, sharding)
        return jax.device_put(np.asarray(x, dtype=dtype), sharding)
    return jnp.asarray(x, dtype=dtype)


def to_np(x: Array) -> np.ndarray:
    """Device array -> host numpy (reference `to_np`, arrays.py:32-44)."""
    if isinstance(x, jax.Array):
        return np.asarray(jax.device_get(x))
    return np.asarray(x)


def batch_to_device(batch: Dict[str, Any], sharding=None) -> Dict[str, jax.Array]:
    """Move every array in a batch dict onto device with an optional sharding
    (reference `batch_to_device`, arrays.py:63-77)."""
    out = {}
    for key, val in batch.items():
        if isinstance(val, (np.ndarray, jax.Array)):
            out[key] = to_jnp(val, dtype=None, sharding=sharding)
        else:
            out[key] = val
    return out


def normalize(x: Array, mean: Array, std: Array) -> Array:
    """(x - mean) / (std + 1e-8)  (reference arrays.py:80-92)."""
    return (x - mean) / (std + 1e-8)


def unnormalize(x: Array, mean: Array, std: Array) -> Array:
    """x * (std + 1e-8) + mean  (reference arrays.py:95-107)."""
    return x * (std + 1e-8) + mean


def atleast_2d(x: Array) -> Array:
    """Prepend axes until ndim >= 2 (reference arrays.py:110-126)."""
    while x.ndim < 2:
        x = x[None]
    return x


def apply_dict(fn: Callable, d: Dict) -> Dict:
    """Apply fn to all values (reference arrays.py:129-140)."""
    return {k: fn(v) for k, v in d.items()}


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a root JAX PRNG key
    (reference `set_seed`, arrays.py:143-156: numpy+torch+cudnn determinism).

    JAX is deterministic by construction given a key, so the returned key is
    the analogue of the reference's global torch seeding. numpy is seeded for
    the host-side pieces (dataset shuffling, gym envs).
    """
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
