"""Launch-minimal U-Net forward built on the fused Pallas residual block.

PROBE-ONLY (ablation evidence): superseded on the quality path by the
pallas megakernel (ops/pallas_planner.py); kept as the measured
per-block-fusion ablation generation (RESULTS.md r2 latency curve).

Consumes the standard TemporalUnet parameter pytree (so checkpoints are
interchangeable) but executes each ResidualTemporalBlock as ONE Pallas kernel
(ops/pallas_resblock.py) instead of ~7 XLA kernels — aimed at the batch-1
planning path, whose step time is launch-bound (see RESULTS.md). Down/up
sampling and the final head remain XLA convs.

Numerical equivalence with ``TemporalUnet.apply`` is tested in
tests/test_fused_unet.py (interpret mode on CPU).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from dadiff_tpu.models.temporal_unet import TemporalUnet, mish
from dadiff_tpu.ops.pallas_resblock import (
    fused_residual_block,
    residual_block_reference,
)


def _time_embedding(params: Dict, t: jax.Array, dim: int) -> jax.Array:
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))
    emb = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    h = emb @ params["time_dense1"]["kernel"] + params["time_dense1"]["bias"]
    h = mish(h)
    return h @ params["time_dense2"]["kernel"] + params["time_dense2"]["bias"]


def _block_params(p: Dict) -> Dict:
    out = {
        "w1": p["block1"]["conv"]["kernel"],
        "b1": p["block1"]["conv"]["bias"],
        "s1": p["block1"]["norm"]["scale"],
        "g1": p["block1"]["norm"]["bias"],
        "w2": p["block2"]["conv"]["kernel"],
        "b2": p["block2"]["conv"]["bias"],
        "s2": p["block2"]["norm"]["scale"],
        "g2": p["block2"]["norm"]["bias"],
    }
    if "residual_conv" in p:
        out["wr"] = p["residual_conv"]["kernel"][0]
        out["br"] = p["residual_conv"]["bias"]
    return out


def _res_block(p: Dict, x, t_emb, use_pallas: bool):
    te = mish(t_emb) @ p["time_dense"]["kernel"] + p["time_dense"]["bias"]
    bp = _block_params(p)
    if use_pallas:
        return fused_residual_block(x, te, bp)
    return residual_block_reference(x, te, bp)


def unet_apply_fused(
    unet: TemporalUnet, params: Dict, x: jax.Array, t=None,
    use_pallas=None, t_emb=None,
) -> jax.Array:
    """Fused-forward equivalent of ``unet.apply({'params': params}, x, t)``.

    ``t_emb`` may be precomputed (e.g. once for all timesteps outside a
    sampling scan) to skip the in-step time MLP. ``use_pallas=None``
    auto-selects: Pallas kernels on TPU, XLA reference elsewhere (explicit
    True off-TPU would fail to lower).
    """
    if t is None and t_emb is None:
        raise ValueError("unet_apply_fused needs t (timesteps) or t_emb")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if t_emb is None:
        t_emb = _time_embedding(params, t, unet.dim)

    n_levels = len(unet.dim_mults)
    skips = []
    for i in range(n_levels):
        x = _res_block(params[f"down_{i}_res1"], x, t_emb, use_pallas)
        x = _res_block(params[f"down_{i}_res2"], x, t_emb, use_pallas)
        skips.append(x)
        if i < n_levels - 1:
            p = params[f"down_{i}_downsample"]
            x = lax.conv_general_dilated(
                x, p["kernel"], (2,), [(1, 1)],
                dimension_numbers=("NHC", "HIO", "NHC"),
            ) + p["bias"]

    x = _res_block(params["mid_block1"], x, t_emb, use_pallas)
    x = _res_block(params["mid_block2"], x, t_emb, use_pallas)

    for i in range(n_levels - 1):
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = _res_block(params[f"up_{i}_res1"], x, t_emb, use_pallas)
        x = _res_block(params[f"up_{i}_res2"], x, t_emb, use_pallas)
        p = params[f"up_{i}_upsample"]
        x = lax.conv_transpose(
            x, p["kernel"], (2,), [(2, 2)],
            dimension_numbers=("NHC", "HIO", "NHC"), transpose_kernel=True,
        ) + p["bias"]

    # final head: Conv1dBlock + 1x1 conv
    fb = params["final_block"]
    k = fb["conv"]["kernel"].shape[0]
    p_same = k // 2
    h = lax.conv_general_dilated(
        x, fb["conv"]["kernel"], (1,), [(p_same, p_same)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + fb["conv"]["bias"]
    from dadiff_tpu.ops.pallas_kernels import group_norm_mish

    h = group_norm_mish(
        h, fb["norm"]["scale"], fb["norm"]["bias"], n_groups=8,
        use_pallas=use_pallas,
    )
    fc = params["final_conv"]
    return jnp.einsum("bhc,cd->bhd", h, fc["kernel"][0]) + fc["bias"]


def make_fused_apply(unet: TemporalUnet, use_pallas: bool = True):
    """apply_fn(params, x, t) drop-in for samplers/benchmarks."""

    def apply_fn(params, x, t):
        return unet_apply_fused(unet, params, x, t, use_pallas=use_pallas)

    return apply_fn
