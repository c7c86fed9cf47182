"""Device mesh + sharding helpers.

The standard recipe (How to Scale Your Model): pick a mesh, annotate
shardings on inputs/params, let XLA insert the collectives — all-reduce for
DP gradients, all-gathers for FSDP parameters — which ride ICI within a
slice. Nothing here issues explicit collectives; jit + shardings do.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a named mesh.

    Args:
        axes: {axis_name: size}; defaults to {'dp': n_devices}. Sizes must
            multiply to the device count (-1 allowed once as wildcard).
    """
    explicit_devices = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axes is None:
        axes = {"dp": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one -1 wildcard axis size is allowed")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    if not explicit_devices:
        # topology-aware assignment so collectives ride contiguous ICI
        # rings (naive enumeration order can place an axis across
        # non-adjacent chips/hosts)
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(tuple(sizes))
            return Mesh(dev_array, tuple(names))
        except Exception:
            pass  # non-TPU backends: enumeration order is fine
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim across ``axis``; other dims replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_fsdp(
    params, mesh: Mesh, axis: str = "dp", min_elements: int = 2**14
):
    """FSDP-style parameter sharding: shard each large leaf along its biggest
    dimension divisible by the mesh axis; small leaves stay replicated. XLA
    inserts the all-gathers at use sites.

    Returns the resharded params pytree.
    """
    size = mesh.shape[axis]

    def placement(leaf):
        if leaf.ndim == 0 or leaf.size < min_elements:
            return NamedSharding(mesh, P())
        dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in dims:
            if leaf.shape[d] % size == 0:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, placement(leaf)), params
    )
