"""Mesh-sharded batched planning.

The reference evaluates with batch_size=1, one CUDA launch per denoise step
(policies.py:217). Here N guided samplers run as one batched jitted scan with
the batch dimension sharded across the mesh — the 'planner fan-out' config
from BASELINE.json (1024 vmapped guided samplers across a v5e-8 mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dadiff_tpu.guides.sampling import Conditions, ProjectionSpec, make_sampler
from dadiff_tpu.parallel.mesh import batch_sharding, replicated_sharding
from dadiff_tpu.models.diffusion import GaussianDiffusion


def make_batched_planner(
    diffusion: GaussianDiffusion,
    mesh: Mesh,
    *,
    batch_axis: str = "dp",
    guide_fn=None,
    guide_weight: float = 1.0,
    projection: Optional[ProjectionSpec] = None,
    sampling_timesteps: Optional[int] = None,
):
    """Returns ``plan(params, rng, conditions, P=None, stats=None)`` where the
    conditions batch (and all per-sample intermediates) are sharded across
    ``batch_axis``. Batch size must be divisible by the mesh axis size.
    """
    plan = make_sampler(
        diffusion,
        guide_fn=guide_fn,
        guide_weight=guide_weight,
        projection=projection,
        sampling_timesteps=sampling_timesteps,
        jit=False,
    )
    cond_sharding = (
        batch_sharding(mesh, batch_axis),  # values (B, H, D)
        replicated_sharding(mesh),  # mask (H,)
    )
    out_sharding = batch_sharding(mesh, batch_axis)
    jitted = jax.jit(plan, out_shardings=out_sharding)

    def planner(params, rng, conditions: Conditions, P_matrix=None, stats=None):
        values = jax.device_put(conditions.values, cond_sharding[0])
        mask = jax.device_put(conditions.mask, cond_sharding[1])
        return jitted(params, rng, Conditions(values, mask), P_matrix, stats)

    return planner
