"""Fully-fused ResidualTemporalBlock as one Pallas kernel.

PROBE-ONLY (ablation evidence): superseded on the quality path by the
pallas megakernel (ops/pallas_planner.py); kept as the measured
single-block-kernel ablation generation (RESULTS.md r2 latency curve).

Batch-1 planning latency is launch-bound: a U-Net step issues ~38 small
kernels (convs, norms, adds) of ~8µs each. This kernel collapses one whole
ResidualTemporalBlock (reference temporal_unet.py:79-122) —

    conv1(k) -> GroupNorm -> Mish -> (+ time) -> conv2(k) -> GroupNorm ->
    Mish -> (+ residual 1x1 conv)

— into a single VMEM-resident program per batch row. The k-tap 'same' convs
are expressed as k shifted matmuls on the MXU (y[h] = sum_j x[h+j-p] @ W_j),
group statistics use the channel->group indicator matmul from
pallas_kernels.py, and everything in between stays in registers/VMEM.

Forward = Pallas; backward = custom VJP through the mathematically identical
XLA composition (training quality unaffected; sampling takes the fast path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _conv_same(x, w, b):
    """XLA reference: 'same' 1-D conv, x (B,H,Cin), w (k,Cin,Cout)."""
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(p, p)], dimension_numbers=("NHC", "HIO", "NHC")
    ) + b


def _gn_mish(x, scale, bias, n_groups, eps=1e-5):
    B, H, C = x.shape
    g = x.reshape(B, H, n_groups, C // n_groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    xn = ((g - mean) / jnp.sqrt(var + eps)).reshape(B, H, C)
    return _mish(xn * scale + bias)


def residual_block_reference(x, te, params, n_groups=8):
    """XLA composition with the exact ResidualTemporalBlock math.

    Args:
        x: (B, H, Cin); te: (B, Cout) post-Dense time embedding.
        params: dict with w1,b1,s1,g1,w2,b2,s2,g2[,wr,br]
            (w: (k,Cin/out,Cout) HIO; s/g: GroupNorm scale/bias).
    """
    h = _conv_same(x, params["w1"], params["b1"])
    h = _gn_mish(h, params["s1"], params["g1"], n_groups)
    h = h + te[:, None, :]
    h = _conv_same(h, params["w2"], params["b2"])
    h = _gn_mish(h, params["s2"], params["g2"], n_groups)
    if "wr" in params:
        res = jnp.einsum("bhc,cd->bhd", x, params["wr"]) + params["br"]
    else:
        res = x
    return h + res


def _kernel(
    x_ref, te_ref, w1_ref, b1_ref, s1_ref, g1_ref,
    w2_ref, b2_ref, s2_ref, g2_ref, wr_ref, br_ref, m_ref, out_ref,
    *, k, n_groups, eps, has_res,
):
    x = x_ref[...]  # (H, Cin)
    H = x.shape[0]
    p = k // 2
    m = m_ref[...]  # (Cout, G)

    def conv(inp, w_ref, b_ref):
        cin = inp.shape[1]
        pad = jnp.zeros((p, cin), jnp.float32)
        xp = jnp.concatenate([pad, inp, pad], axis=0)  # (H+2p, Cin)
        # k static shifted views -> k MXU matmuls (static slices only;
        # Mosaic has no dynamic_slice on values)
        acc = jnp.dot(xp[0:H], w_ref[0], preferred_element_type=jnp.float32)
        for j in range(1, k):
            acc += jnp.dot(
                xp[j : j + H], w_ref[j], preferred_element_type=jnp.float32
            )
        return acc + b_ref[...]

    def gn_mish(h, s_ref, g_ref):
        count = H * (h.shape[1] // n_groups)
        s1 = jnp.dot(jnp.sum(h, axis=0, keepdims=True), m,
                     preferred_element_type=jnp.float32)
        s2 = jnp.dot(jnp.sum(h * h, axis=0, keepdims=True), m,
                     preferred_element_type=jnp.float32)
        mean_g = s1 / count
        var_g = s2 / count - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)
        rstd_c = jnp.dot(rstd_g, m.T, preferred_element_type=jnp.float32)
        y = (h - mean_c) * rstd_c * s_ref[...] + g_ref[...]
        return y * jnp.tanh(jax.nn.softplus(y))

    h = conv(x, w1_ref, b1_ref)
    h = gn_mish(h, s1_ref, g1_ref)
    h = h + te_ref[...]
    h = conv(h, w2_ref, b2_ref)
    h = gn_mish(h, s2_ref, g2_ref)

    if has_res:
        res = jnp.dot(x, wr_ref[...], preferred_element_type=jnp.float32) + br_ref[...]
    else:
        res = x
    out_ref[...] = h + res


def residual_block_pallas(x, te, params, n_groups=8, eps=1e-5, interpret=False):
    """Fused forward. x (B,H,Cin), te (B,Cout) -> (B,H,Cout)."""
    if not _HAS_PALLAS:  # pragma: no cover
        return residual_block_reference(x, te, params, n_groups)

    B, H, Cin = x.shape
    k, _, Cout = params["w1"].shape
    has_res = "wr" in params
    group_ids = jnp.arange(Cout) // (Cout // n_groups)
    m = jax.nn.one_hot(group_ids, n_groups, dtype=jnp.float32)

    wr = params.get("wr", jnp.zeros((Cin, Cout), jnp.float32))
    br = params.get("br", jnp.zeros((Cout,), jnp.float32))

    kernel = functools.partial(
        _kernel, k=k, n_groups=n_groups, eps=eps, has_res=has_res
    )
    row = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, Cin), lambda b: (b, 0, 0)),   # x
            pl.BlockSpec((None, 1, Cout), lambda b: (b, 0, 0)),  # te
            row((k, Cin, Cout)), row((1, Cout)),                 # w1, b1
            row((1, Cout)), row((1, Cout)),                      # s1, g1
            row((k, Cout, Cout)), row((1, Cout)),                # w2, b2
            row((1, Cout)), row((1, Cout)),                      # s2, g2
            row((Cin, Cout)), row((1, Cout)),                    # wr, br
            row((Cout, n_groups)),                               # m
        ],
        out_specs=pl.BlockSpec((None, H, Cout), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Cout), jnp.float32),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        te.astype(jnp.float32)[:, None, :],
        params["w1"].astype(jnp.float32), params["b1"].reshape(1, -1),
        params["s1"].reshape(1, -1), params["g1"].reshape(1, -1),
        params["w2"].astype(jnp.float32), params["b2"].reshape(1, -1),
        params["s2"].reshape(1, -1), params["g2"].reshape(1, -1),
        wr, br.reshape(1, -1),
        m,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_residual_block(x, te, params, n_groups=8):
    """Pallas forward, XLA-reference backward (see module docstring)."""
    return residual_block_pallas(x, te, params, n_groups)


def _frb_fwd(x, te, params, n_groups):
    return fused_residual_block(x, te, params, n_groups), (x, te, params)


def _frb_bwd(n_groups, residuals, g):
    x, te, params = residuals
    _, vjp = jax.vjp(
        lambda x_, te_, p_: residual_block_reference(x_, te_, p_, n_groups),
        x, te, params,
    )
    return vjp(g)


fused_residual_block.defvjp(_frb_fwd, _frb_bwd)
