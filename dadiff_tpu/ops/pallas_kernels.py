"""Pallas TPU kernels for the memory-bound pieces of the denoiser.

The U-Net's FLOPs live in convolutions (MXU territory, already optimal under
XLA); the remaining per-step cost is many small memory-bound ops. This module
fuses GroupNorm(8) + Mish — the reference's Conv1dBlock tail
(temporal_unet.py:57-76) — into one VMEM-resident kernel: statistics,
normalization, affine, and activation in a single pass over the block.

Group statistics are computed MXU-style with a channel->group indicator
matmul instead of reshaping to (H, G, C/G) (whose 16-wide last dim tiles
poorly); the lane dimension stays the full channel axis.

``group_norm_mish`` dispatches to the Pallas kernel on TPU (or in forced
interpret mode) and to a reference XLA implementation elsewhere; both paths
are numerically checked against each other in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas is TPU/interpret-capable; import guarded for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def group_norm_mish_reference(
    x: jax.Array, scale: jax.Array, bias: jax.Array, n_groups: int = 8,
    eps: float = 1e-5,
) -> jax.Array:
    """Pure-XLA reference: GroupNorm over (H, channels-in-group) + Mish.

    x: (B, H, C); scale/bias: (C,). Matches torch GroupNorm semantics on
    (B, C, L) data transposed to feature-last.
    """
    B, H, C = x.shape
    g = x.reshape(B, H, n_groups, C // n_groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    xn = ((g - mean) / jnp.sqrt(var + eps)).reshape(B, H, C)
    return mish(xn * scale + bias)


def _gn_mish_kernel(x_ref, scale_ref, bias_ref, m_ref, out_ref, *, n_groups, eps):
    """One batch element per program: (H, C) block fully in VMEM."""
    x = x_ref[...]  # (H, C) float32
    H, C = x.shape
    m = m_ref[...]  # (C, G) group indicator

    count = H * (C // n_groups)
    # group sums / sums of squares via MXU: (1,C)@(C,G)
    s1 = jnp.dot(jnp.sum(x, axis=0, keepdims=True), m,
                 preferred_element_type=jnp.float32)  # (1, G)
    s2 = jnp.dot(jnp.sum(x * x, axis=0, keepdims=True), m,
                 preferred_element_type=jnp.float32)  # (1, G)
    mean_g = s1 / count
    var_g = s2 / count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    # broadcast group stats back to channels: (1,G)@(G,C)
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(rstd_g, m.T, preferred_element_type=jnp.float32)  # (1, C)

    xn = (x - mean_c) * rstd_c
    # scale/bias arrive as (1, C) rows; the in-kernel broadcast is free,
    # while (H, C) operands would double this memory-bound kernel's input
    # traffic (H copies of the same row through HBM->VMEM per grid step)
    y = xn * scale_ref[...] + bias_ref[...]
    out_ref[...] = y * jnp.tanh(jax.nn.softplus(y))


def group_norm_mish_pallas(
    x: jax.Array, scale: jax.Array, bias: jax.Array, n_groups: int = 8,
    eps: float = 1e-5, interpret: bool = False,
) -> jax.Array:
    """Fused GroupNorm+Mish as a Pallas kernel, gridded over batch."""
    if not _HAS_PALLAS:  # pragma: no cover
        return group_norm_mish_reference(x, scale, bias, n_groups, eps)

    B, H, C = x.shape
    assert C % n_groups == 0, f"channels {C} not divisible by groups {n_groups}"
    group_ids = jnp.arange(C) // (C // n_groups)
    m = jax.nn.one_hot(group_ids, n_groups, dtype=jnp.float32)  # (C, G)

    kernel = functools.partial(_gn_mish_kernel, n_groups=n_groups, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((C, n_groups), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        scale.astype(jnp.float32).reshape(1, C),
        bias.astype(jnp.float32).reshape(1, C),
        m,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _group_norm_mish_ad(x, scale, bias, n_groups, eps):
    """Pallas forward with an XLA-reference backward (custom_vjp): the kernel
    serves the sampling hot path at full speed while training still
    differentiates through the mathematically identical reference."""
    return group_norm_mish_pallas(x, scale, bias, n_groups, eps)


def _gn_fwd(x, scale, bias, n_groups, eps):
    return _group_norm_mish_ad(x, scale, bias, n_groups, eps), (x, scale, bias)


def _gn_bwd(n_groups, eps, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_mish_reference(x_, s_, b_, n_groups, eps),
        x, scale, bias,
    )
    return vjp(g)


_group_norm_mish_ad.defvjp(_gn_fwd, _gn_bwd)


def group_norm_mish(
    x: jax.Array, scale: jax.Array, bias: jax.Array, n_groups: int = 8,
    eps: float = 1e-5, use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatching entry point: Pallas on TPU, XLA reference elsewhere.
    Differentiable on both paths."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and _HAS_PALLAS:
        return _group_norm_mish_ad(x, scale, bias, n_groups, eps)
    return group_norm_mish_reference(x, scale, bias, n_groups, eps)
