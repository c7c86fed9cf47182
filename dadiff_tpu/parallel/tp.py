"""Tensor / sequence parallelism for the Temporal U-Net.

The reference has no parallelism at all (SURVEY.md §2.2); dp/fsdp sharding
lives in parallel/mesh.py. This module adds the remaining mesh dimensions
for scaling the *model* rather than the batch:

  * **tp** (tensor parallel): conv/dense output channels sharded across the
    mesh — each device holds a slice of every kernel and computes a slice of
    every activation. GroupNorm(8) reduces within channel groups, so a tp
    size that divides the group count keeps normalization device-local.
  * **sp** (sequence parallel): the horizon axis sharded across the mesh —
    XLA partitions the 1-D convs spatially and inserts halo exchanges for
    the kernel overlap.

Both follow the standard GSPMD recipe (How to Scale Your Model): annotate
parameter shardings + activation constraints, let XLA insert the
collectives. Nothing here issues explicit collectives.

pp/ep are deliberately absent: the largest model in this family is a
~235M-param U-Net (dim=256, mults 1-2-4-8) that fits on-chip with room to
spare — pipeline stages would only add bubble overhead — and there is no
mixture-of-experts routing anywhere in the architecture.

Usage:
    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
    unet = TemporalUnet(..., act_spec=("dp", "sp", "tp"))
    params = shard_params_tp(params, mesh, tp_axis="tp")
    with jax.set_mesh(mesh):
        out = jax.jit(...)  # trace + run under the ambient mesh
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_constrain(x: jax.Array, spec: Sequence[Optional[str]]) -> jax.Array:
    """``with_sharding_constraint`` gated on an ambient mesh.

    No-op when no mesh context is active (``jax.set_mesh``) or when none of
    the named axes exist in it, so models can carry constraint annotations
    unconditionally without affecting single-device use.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return x
    names = set(mesh.axis_names)
    spec = tuple(s if s in names else None for s in spec)
    if all(s is None for s in spec):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def _tp_spec_for_leaf(name: str, leaf, tp_size: int, min_size: int):
    """PartitionSpec sharding a U-Net parameter leaf over the tp axis.

    Layout conventions (models/temporal_unet.py):
      nn.Conv kernel           (k, in, out)   -> shard dim 2
      ConvTranspose1d kernel   (k, out, in)   -> shard dim 1
      nn.Dense kernel          (in, out)      -> shard dim 1
      bias / norm scale        (out,)         -> shard dim 0
    Leaves whose output dim is too small or not divisible stay replicated.
    """
    if "attn" in name:
        # flax MultiHeadDotProductAttention (TemporalTransformer blocks):
        #   q/k/v kernel (in, heads, head_dim), bias (heads, head_dim)
        #   out   kernel (heads, head_dim, out), bias (out,)
        # Megatron-style: shard the HEADS dim so per-head attention stays
        # device-local; the out projection contracts over heads (XLA
        # inserts the psum). Out bias adds post-reduction: replicated.
        if leaf.ndim == 3:
            out_dim = 0 if "out" in name else 1
        elif leaf.ndim == 2:
            out_dim = 0
        else:
            return None
    elif "time_dense" in name and leaf.ndim <= 2:
        # Time-MLP projections whose per-device shard would be < 128 lanes:
        # GSPMD's cost model all-gathers the WHOLE kernel at the use site
        # rather than run the narrow sharded matmul — measured on the
        # dim=256 tp=4 forward (scripts/analyze_tp_comm.py caught 2x 256KB
        # weight gathers per step). Replicate kernel AND bias outright:
        # removes the per-step collective for a few hundred KB of memory
        # (Megatron replicates small projections for the same reason).
        out_dim = leaf.ndim - 1
        if leaf.shape[out_dim] // max(1, tp_size) < 128:
            return None
    elif leaf.ndim == 3:
        out_dim = 1 if "upsample" in name else 2
    elif leaf.ndim == 2:
        out_dim = 1
    elif leaf.ndim == 1:
        out_dim = 0
    else:
        return None
    # Attention heads counts are small by design; divisibility alone gates
    # them (min_size guards only wide channel dims).
    floor = 1 if "attn" in name else min_size
    if leaf.shape[out_dim] % tp_size != 0 or leaf.shape[out_dim] < floor:
        return None
    spec = [None] * leaf.ndim
    spec[out_dim] = "__tp__"
    return spec


def unet_param_specs(
    params,
    mesh: Mesh,
    *,
    tp_axis: str = "tp",
    fsdp_axis: Optional[str] = None,
    min_size: int = 16,
):
    """PartitionSpec pytree for tp (+ optional fsdp) sharding of U-Net params.

    With ``fsdp_axis``, the largest non-tp dimension of each kernel is
    additionally sharded (2-D parameter sharding; XLA all-gathers over the
    fsdp axis at use sites).
    """
    tp_size = mesh.shape[tp_axis]
    fsdp_size = mesh.shape[fsdp_axis] if fsdp_axis else 1

    def build(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = _tp_spec_for_leaf(name, leaf, tp_size, min_size)
        if spec is None:
            spec = [None] * leaf.ndim
        spec = [tp_axis if s == "__tp__" else s for s in spec]
        if fsdp_axis and fsdp_size > 1:
            free = [
                d for d in range(leaf.ndim)
                if spec[d] is None
                and leaf.shape[d] % fsdp_size == 0
                and leaf.shape[d] >= min_size
            ]
            if free:
                d = max(free, key=lambda d: leaf.shape[d])
                spec[d] = fsdp_axis
        return P(*spec)

    return jax.tree_util.tree_map_with_path(build, params)


def shard_params_tp(
    params,
    mesh: Mesh,
    *,
    tp_axis: str = "tp",
    fsdp_axis: Optional[str] = None,
    min_size: int = 16,
):
    """Place U-Net params with output channels sharded over ``tp_axis``.

    Returns the resharded params pytree; composes with batch sharding over
    'dp' and activation constraints (``TemporalUnet(act_spec=...)``).
    """
    specs = unet_param_specs(
        params, mesh, tp_axis=tp_axis, fsdp_axis=fsdp_axis, min_size=min_size
    )
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
