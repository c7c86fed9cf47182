"""Whole-chain Pallas megakernel: the ENTIRE reverse-diffusion loop as one
TPU kernel.

Why: at batch 1 the XLA scan body is ~80 small fused regions per denoise
step; per-region dispatch gaps (~3-4 us each) dominate the ~330 us step while
the actual compute is ~30 us (weights stay VMEM-resident either way —
measured: bf16 weights change nothing, scripts/perf_probe.py). The fix is to
erase the per-op boundaries entirely: one ``pallas_call`` with ``grid=(T,)``
runs the full U-Net + DDPM update per grid step, weights pinned in VMEM
across all steps (constant index_map -> no re-DMA), the iterate carried in a
VMEM scratch.

Mapping to hardware:
  * every conv is a matmul on the MXU: k-tap conv -> shifted-stack
    ``(H, k*Cin) @ (k*Cin, Cout)`` with f32 accumulation,
  * GroupNorm stats via tiny group-selector matmuls (no lane reshapes),
  * down/upsampling as stride-decomposed matmuls + row select/interleave,
  * weights stored bf16 (fits VMEM: ~32 MB), norm/bias params f32.

Replaces (semantically) the reference's host-driven loop
m_diffuser/models/diffusion.py:225-251 composed with the TemporalUnet
forward temporal_unet.py:199-241. Equivalence is tested in interpret mode
against the XLA path (tests/test_pallas_unet.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.schedules import DiffusionSchedule


# ---------------------------------------------------------------------------
# Parameter flattening (TemporalUnet pytree -> ordered 2D arrays)
# ---------------------------------------------------------------------------

def _resblock_entries(name: str, cin: int, cout: int):
    """(key, shape-kind) entries for one ResidualTemporalBlock."""
    ent = [
        # order matches in-kernel consumption: block1, time add, block2, res
        (name, "block1.conv.kernel", "conv"),   # (5*cin, cout) bf16
        (name, "block1.conv.bias", "vec"),      # (1, cout) f32
        (name, "block1.norm.scale", "vec"),
        (name, "block1.norm.bias", "vec"),
        (name, "time_dense.kernel", "mat"),     # (time_dim, cout) bf16
        (name, "time_dense.bias", "vec"),
        (name, "block2.conv.kernel", "conv"),
        (name, "block2.conv.bias", "vec"),
        (name, "block2.norm.scale", "vec"),
        (name, "block2.norm.bias", "vec"),
    ]
    if cin != cout:
        ent += [
            (name, "residual_conv.kernel", "conv1"),  # (cin, cout) bf16
            (name, "residual_conv.bias", "vec"),
        ]
    return ent


def _layer_plan(unet: TemporalUnet):
    """Static walk of the architecture: list of (op, meta) in forward order
    plus the flattened-parameter entry list."""
    dims = [unet.transition_dim] + [unet.dim * m for m in unet.dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    n_levels = len(in_out)

    ops = []
    entries = []

    def res(name, cin, cout):
        ops.append(("res", name, cin, cout))
        entries.extend(_resblock_entries(name, cin, cout))

    for i, (cin, cout) in enumerate(in_out):
        res(f"down_{i}_res1", cin, cout)
        res(f"down_{i}_res2", cout, cout)
        ops.append(("push_skip", i, cout))
        if i < n_levels - 1:
            ops.append(("down", f"down_{i}_downsample", cout, cout))
            entries.append((f"down_{i}_downsample", "kernel", "conv"))
            entries.append((f"down_{i}_downsample", "bias", "vec"))

    mid = dims[-1]
    res("mid_block1", mid, mid)
    res("mid_block2", mid, mid)

    for i, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
        skip_level = n_levels - 1 - i
        ops.append(("pop_skip", skip_level, dim_out))
        res(f"up_{i}_res1", dim_out * 2, dim_in)
        res(f"up_{i}_res2", dim_in, dim_in)
        ops.append(("up", f"up_{i}_upsample", dim_in, dim_in))
        entries.append((f"up_{i}_upsample", "kernel", "convT"))
        entries.append((f"up_{i}_upsample", "bias", "vec"))

    ops.append(("res_plain", "final_block", unet.dim, unet.dim))
    entries.extend([
        ("final_block", "conv.kernel", "conv"),
        ("final_block", "conv.bias", "vec"),
        ("final_block", "norm.scale", "vec"),
        ("final_block", "norm.bias", "vec"),
    ])
    ops.append(("final_conv", "final_conv", unet.dim, unet.transition_dim))
    entries.extend([
        ("final_conv", "kernel", "conv1"),
        ("final_conv", "bias", "vec"),
    ])
    return ops, entries


def _dig(params, name, path):
    node = params[name]
    for k in path.split(".")[:-1]:
        node = node[k]
    return node[path.split(".")[-1]]


def flatten_unet_params(unet: TemporalUnet, params, weight_dtype=jnp.bfloat16):
    """TemporalUnet param pytree -> ordered list of 2D device arrays.

    Conv kernels (k, cin, cout) reshape to (k*cin, cout) (tap-major rows,
    matching the shifted-stack column order); ConvTranspose kernels
    (4, out, in) become the stacked per-tap (4*in, out) [R0;R1;R2;R3] with
    R_tap = kernel[tap].T; vectors become (1, c) float32.
    """
    _, entries = _layer_plan(unet)
    flat = []
    for name, path, kind in entries:
        a = _dig(params, name, path)
        if kind == "conv":
            k, cin, cout = a.shape
            flat.append(a.reshape(k * cin, cout).astype(weight_dtype))
        elif kind == "conv1":
            flat.append(a.reshape(a.shape[-2], a.shape[-1]).astype(weight_dtype)
                        if a.ndim == 3 else a.astype(weight_dtype))
        elif kind == "convT":
            k, cout, cin = a.shape  # ConvTranspose1d stores (k, out, in)
            taps = [jnp.transpose(a[t]) for t in range(k)]  # (in, out) each
            flat.append(jnp.concatenate(taps, axis=0).astype(weight_dtype))
        elif kind == "mat":
            flat.append(a.astype(weight_dtype))
        elif kind == "vec":
            flat.append(a.reshape(1, -1).astype(jnp.float32))
        else:
            raise ValueError(kind)
    return flat


# ---------------------------------------------------------------------------
# In-kernel building blocks (operate on VALUES, not refs)
# ---------------------------------------------------------------------------

def _shift_rows(x, s, seg=None):
    """y[h] = x[h-s] with zero padding (s>0 shifts content down).

    With ``seg`` (rows per chain when several chains are row-stacked), the
    zero padding applies PER SEGMENT: rows that would receive content from
    the neighboring chain are zeroed instead — SAME-conv boundary semantics
    for every chain independently.
    """
    if s == 0:
        return x
    if x.dtype == jnp.bfloat16:
        # pltpu.roll on bf16 crashes the Mosaic compiler (observed on v5e);
        # shift in f32 and cast back — shifts are a tiny fraction of the work
        return _shift_rows(x.astype(jnp.float32), s, seg).astype(jnp.bfloat16)
    H = x.shape[0]
    L = H if seg is None else seg
    y = pltpu.roll(x, shift=s % H, axis=0)  # pltpu.roll wants shift >= 0
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pos = idx if seg is None else idx % seg
    mask = pos >= s if s > 0 else pos < L + s
    return jnp.where(mask, y, jnp.zeros_like(y))


def _conv_stack(x, k, seg=None):
    """(H, C) -> (H, k*C) shifted stack so that stack @ W == k-tap SAME conv."""
    half = k // 2
    return jnp.concatenate(
        [_shift_rows(x, half - t, seg) for t in range(k)], axis=1
    )


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _group_norm_mish(h, scale, bias, n_groups=8, eps=1e-5, n_chains=1):
    """GroupNorm over (H, group-channels) + Mish, all f32.

    With ``n_chains > 1`` the rows hold several chains stacked (rows per
    chain = H // n_chains) and the statistics are computed PER CHAIN via a
    chain-selector matmul (no lane reshapes, stays on the MXU).
    """
    H, C = h.shape
    cg = C // n_groups
    # group-selector one-hot (C, G) built from iota (no lane reshapes)
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, n_groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (C, n_groups), 1)
    G = (ch // cg == gr).astype(jnp.float32)

    hG = _dot(h, G)            # (H, G) per-row group sums
    h2G = _dot(h * h, G)
    if n_chains == 1:
        n = float(H * cg)
        mean_g = jnp.sum(hG, axis=0, keepdims=True) / n      # (1, G)
        var_g = jnp.sum(h2G, axis=0, keepdims=True) / n - mean_g * mean_g
        mean_c = _dot(mean_g, G.T)                           # (1, C)
        rstd_c = _dot(jax.lax.rsqrt(var_g + eps), G.T)
    else:
        seg = H // n_chains
        n = float(seg * cg)
        # chain-selector one-hot (H, N): row r belongs to chain r // seg
        rr = jax.lax.broadcasted_iota(jnp.int32, (H, n_chains), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (H, n_chains), 1)
        Csel = (rr // seg == cc).astype(jnp.float32)
        sum_ng = jax.lax.dot_general(
            Csel, hG, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (N, G)
        sum2_ng = jax.lax.dot_general(
            Csel, h2G, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mean_ng = sum_ng / n
        var_ng = sum2_ng / n - mean_ng * mean_ng
        mean_c = _dot(_dot(Csel, mean_ng), G.T)              # (H, C)
        rstd_c = _dot(_dot(Csel, jax.lax.rsqrt(var_ng + eps)), G.T)
    y = (h - mean_c) * rstd_c * scale + bias
    return y * jnp.tanh(jax.nn.softplus(y))


def _even_rows(x):
    H, C = x.shape
    return x.reshape(H // 2, 2, C)[:, 0, :]


def _interleave_rows(a, b):
    """rows [a0, b0, a1, b1, ...]: (H,C),(H,C) -> (2H,C)."""
    H, C = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * H, C)


# ---------------------------------------------------------------------------
# The megakernel
# ---------------------------------------------------------------------------

def _unet_forward(x, m_emb, wrefs, ops, compute_dtype, n_chains=1):
    """Full U-Net forward inside the kernel. x: (H, D) f32; m_emb: (1, time_dim)
    (pre-Mish'd time embedding). wrefs: iterator over weight refs in
    flatten_unet_params order.

    ``n_chains > 1``: x holds several independent chains row-stacked
    ((N*H, D)); convs/norms apply per chain (segment-masked shifts,
    per-chain GroupNorm stats) so the result equals N separate forwards.
    """
    it = iter(wrefs)

    def nxt():
        return next(it)[:]

    def seg_of(h):
        return h.shape[0] // n_chains if n_chains > 1 else None

    def conv_block(h, k):
        w, b, sc, bi = nxt(), nxt(), nxt(), nxt()
        stack = _conv_stack(h.astype(compute_dtype), k, seg_of(h))
        y = _dot(stack, w) + b
        return _group_norm_mish(y, sc, bi, n_chains=n_chains)

    def res_block(h, cin, cout, k):
        h_in = h
        h = conv_block(h, k)
        wt, bt = nxt(), nxt()
        te = _dot(m_emb.astype(compute_dtype), wt) + bt      # (1, cout)
        h = h + te
        h = conv_block(h, k)
        if cin != cout:
            wr, br = nxt(), nxt()
            res = _dot(h_in.astype(compute_dtype), wr) + br
        else:
            res = h_in
        return h + res

    k = 5  # unet.kernel_size baked statically by the caller via ops
    skips = {}
    for op in ops:
        kind = op[0]
        if kind == "res":
            _, name, cin, cout = op
            x = res_block(x, cin, cout, k)
        elif kind == "push_skip":
            skips[op[1]] = x
        elif kind == "pop_skip":
            x = jnp.concatenate([x, skips.pop(op[1])], axis=1)
        elif kind == "down":
            w, b = nxt(), nxt()
            stack = _conv_stack(x.astype(compute_dtype), 3, seg_of(x))
            x = _even_rows(_dot(stack, w) + b)
        elif kind == "up":
            w, b = nxt(), nxt()
            C = op[2]
            xc = x.astype(compute_dtype)
            seg = seg_of(x)
            R = [w[t * C:(t + 1) * C] for t in range(4)]
            even = _dot(xc, R[1]) + _dot(_shift_rows(xc, 1, seg), R[3]) + b
            odd = _dot(_shift_rows(xc, -1, seg), R[0]) + _dot(xc, R[2]) + b
            x = _interleave_rows(even, odd)
        elif kind == "res_plain":
            x = conv_block(x, k)
        elif kind == "final_conv":
            w, b = nxt(), nxt()
            x = _dot(x.astype(compute_dtype), w) + b
        else:
            raise ValueError(kind)
    try:
        next(it)
        raise AssertionError("unconsumed weight refs")
    except StopIteration:
        pass
    return x


def make_pallas_chain(
    unet: TemporalUnet,
    schedule: DiffusionSchedule,
    horizon: int,
    *,
    sampling_timesteps: Optional[int] = None,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
    condition_row0: bool = False,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Build ``chain(flat_weights, x_init, m_embs, step_noise, scal...) -> x``
    running the full T-step reverse diffusion as ONE pallas_call.

    Use :func:`pallas_p_sample_loop` for the user-facing wrapper (it prepares
    all operands from (params, rng)).
    """
    from dadiff_tpu.models.diffusion import default_timesteps

    ts = default_timesteps(schedule.n_timesteps, sampling_timesteps)
    T = int(ts.shape[0])
    D = unet.transition_dim
    H = horizon
    ops, entries = _layer_plan(unet)
    n_weights = len(entries)
    compute_dtype = weight_dtype

    def kernel(*refs):
        # ref order: weights..., x0, m_embs(1,time), noise(1,H,D),
        #            scal(5 x (1,)), [cond], out, x_scratch
        wrefs = refs[:n_weights]
        rest = list(refs[n_weights:])
        x0_ref = rest.pop(0)
        memb_ref = rest.pop(0)  # block (1, 1, time_dim)
        noise_ref = rest.pop(0)
        scal_ref = rest.pop(0)  # block (1, 1, 8): recip, recipm1, c1, c2, sigma
        cond_ref = rest.pop(0) if condition_row0 else None
        out_ref = rest.pop(0)
        x_ref = rest.pop(0)

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            if condition_row0:
                # Condition the initial iterate BEFORE the first model call
                # (make_sampler applies conditions to x_T as well).
                row0 = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
                x_ref[:] = jnp.where(row0 == 0, cond_ref[:], x0_ref[:])
            else:
                x_ref[:] = x0_ref[:]

        x = x_ref[:]
        eps_out = _unet_forward(x, memb_ref[0], wrefs, ops, compute_dtype)

        recip = scal_ref[0, 0, 0]
        recipm1 = scal_ref[0, 0, 1]
        c1 = scal_ref[0, 0, 2]
        c2 = scal_ref[0, 0, 3]
        sigma = scal_ref[0, 0, 4]

        if predict_epsilon:
            x_recon = recip * x - recipm1 * eps_out
        else:
            x_recon = eps_out
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        x_next = c1 * x_recon + c2 * x + sigma * noise_ref[0]

        if condition_row0:
            row = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
            x_next = jnp.where(row == 0, cond_ref[:], x_next)

        x_ref[:] = x_next
        out_ref[:] = x_next

    w_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM)  # full array, constant block
        for _ in range(n_weights)
    ]
    time_dim = unet.time_dim or unet.dim
    # per-step operands carry a singleton axis so the grid-indexed dimension
    # stays out of the trailing two (Pallas TPU block-shape constraint)
    in_specs = w_specs + [
        pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),   # x0
        pl.BlockSpec((1, 1, time_dim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if condition_row0:
        in_specs.append(
            pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    grid = (T,)

    def chain(flat_w, x0, m_embs, step_noise, scal, cond=None):
        args = list(flat_w) + [x0, m_embs[:, None, :], step_noise,
                               scal[:, None, :]]
        if condition_row0:
            args.append(cond)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (H, D), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((H, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, D), jnp.float32)],
            interpret=interpret,
        )(*args)

    chain.timesteps = ts
    chain.n_steps = T
    return chain


def prepare_chain_operands(
    unet: TemporalUnet,
    schedule: DiffusionSchedule,
    params,
    ts: jax.Array,
    weight_dtype=jnp.bfloat16,
):
    """Host/XLA-side precomputation shared across calls: flattened weights and
    the pre-Mish'd per-step time embeddings + DDPM scalars."""
    from dadiff_tpu.models.fused_unet import _time_embedding
    from dadiff_tpu.models.temporal_unet import mish

    flat_w = flatten_unet_params(unet, params, weight_dtype=weight_dtype)
    t_embs = _time_embedding(params, ts, unet.dim)          # (T, time_dim)
    m_embs = mish(t_embs).astype(jnp.float32)

    T = ts.shape[0]
    scal = jnp.zeros((T, 8), jnp.float32)
    scal = scal.at[:, 0].set(schedule.sqrt_recip_alphas_cumprod[ts])
    scal = scal.at[:, 1].set(schedule.sqrt_recipm1_alphas_cumprod[ts])
    scal = scal.at[:, 2].set(schedule.posterior_mean_coef1[ts])
    scal = scal.at[:, 3].set(schedule.posterior_mean_coef2[ts])
    sigma = jnp.exp(0.5 * schedule.posterior_log_variance_clipped[ts])
    scal = scal.at[:, 4].set(sigma * (ts != 0))
    return flat_w, m_embs, scal


def pallas_p_sample_loop(
    unet: TemporalUnet,
    params,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: Tuple[int, int, int],
    *,
    sampling_timesteps: Optional[int] = None,
    interpret: bool = False,
    weight_dtype=jnp.bfloat16,
    init_noise: Optional[jax.Array] = None,
    step_noise: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
    cond: Optional[jax.Array] = None,
) -> jax.Array:
    """Drop-in (batch-1) equivalent of ``GaussianDiffusion.p_sample_loop``
    running the entire chain as one Pallas kernel. shape = (1, H, D).

    ``cond``: optional (H, D) or (1, H, D) array whose row 0 is inpainted
    into every iterate (including the initial one), matching the
    make_sampler initial-observation conditioning.
    """
    assert shape[0] == 1, "megakernel chain is the batch-1 latency path"
    _, H, D = shape
    chain = make_pallas_chain(
        unet, schedule, H,
        sampling_timesteps=sampling_timesteps, interpret=interpret,
        weight_dtype=weight_dtype,
        clip_denoised=clip_denoised, predict_epsilon=predict_epsilon,
        condition_row0=cond is not None,
    )
    ts = chain.timesteps
    T = chain.n_steps

    rng, init_key, noise_key = jax.random.split(rng, 3)
    x = jax.random.normal(init_key, shape) if init_noise is None else init_noise
    if step_noise is None:
        step_noise = jax.random.normal(noise_key, (T,) + shape)

    flat_w, m_embs, scal = prepare_chain_operands(
        unet, schedule, params, ts, weight_dtype=weight_dtype
    )
    if cond is not None:
        cond = jnp.asarray(cond, jnp.float32).reshape(H, D)
        out = chain(flat_w, x[0], m_embs, step_noise[:, 0], scal, cond)
    else:
        out = chain(flat_w, x[0], m_embs, step_noise[:, 0], scal)
    return out[None]
