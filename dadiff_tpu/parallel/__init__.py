"""Parallelism layer: device meshes, sharding rules, batched planners.

New capability relative to the reference, which is strictly single-device
(SURVEY.md §2.2: no torch.distributed/NCCL/MPI anywhere). Scaling here is
mesh-based: data-parallel training via batch sharding + XLA collectives over
ICI, FSDP-style parameter sharding for memory, and mesh-sharded vmapped
planners for batched evaluation.
"""

from dadiff_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_params_fsdp,
)
from dadiff_tpu.parallel.planner import make_batched_planner
from dadiff_tpu.parallel.tp import (
    maybe_constrain,
    shard_params_tp,
    unet_param_specs,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_params_fsdp",
    "make_batched_planner",
    "maybe_constrain",
    "shard_params_tp",
    "unet_param_specs",
]
