"""Latency-tuned sequential sampler: minimal per-step op count.

PROBE-ONLY (ablation evidence): superseded on the quality path by the
pallas megakernel (ops/pallas_planner.py); kept as the measured
hoisted-coefficient ablation generation (RESULTS.md r2 latency curve).

The standard scan body spends a noticeable fraction of its ~0.3 ms on small
ops that do not depend on the iterate: the timestep-embedding MLP and six
coefficient gathers from the schedule. Here both are hoisted out of the scan
— all T embeddings are computed in one batched MLP call, and the per-step
DDPM coefficients ride in as scan inputs — leaving the body with just the
U-Net trunk and a fused affine update:

    x <- c1 * x_recon_clip(recip*x - recipm1*eps) + c2 * x + sigma * noise

Uses the param-dict forward (fused_unet) so the time MLP can be invoked
standalone; numerically identical to GaussianDiffusion.p_sample_loop
(tests/test_fast_sampler.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dadiff_tpu.models.diffusion import default_timesteps
from dadiff_tpu.models.fused_unet import _time_embedding, unet_apply_fused
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.schedules import DiffusionSchedule


def fast_p_sample_loop(
    unet: TemporalUnet,
    params,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: Tuple[int, ...],
    *,
    sampling_timesteps: Optional[int] = None,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
    use_pallas: bool = False,
    init_noise: Optional[jax.Array] = None,
    step_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Drop-in equivalent of ``GaussianDiffusion.p_sample_loop`` with the
    time MLP and schedule gathers hoisted out of the scan."""
    ts = default_timesteps(schedule.n_timesteps, sampling_timesteps)
    T = int(ts.shape[0])
    batch = shape[0]

    rng, init_key, noise_key = jax.random.split(rng, 3)
    x = jax.random.normal(init_key, shape) if init_noise is None else init_noise
    if step_noise is None:
        step_noise = jax.random.normal(noise_key, (T,) + shape)

    # hoisted: all T time embeddings in one MLP call, (T, time_dim)
    t_embs = _time_embedding(params, ts, unet.dim)

    # hoisted: per-step scalars (T,)
    def g(a):
        return a[ts].reshape(T, *([1] * len(shape)))

    recip = g(schedule.sqrt_recip_alphas_cumprod)
    recipm1 = g(schedule.sqrt_recipm1_alphas_cumprod)
    c1 = g(schedule.posterior_mean_coef1)
    c2 = g(schedule.posterior_mean_coef2)
    sigma = g(jnp.exp(0.5 * schedule.posterior_log_variance_clipped))
    sigma = sigma * (ts != 0).astype(jnp.float32).reshape(T, *([1] * len(shape)))

    def body(x, inputs):
        t_emb, noise, recip_t, recipm1_t, c1_t, c2_t, sigma_t = inputs
        emb = jnp.broadcast_to(t_emb[None], (batch, t_emb.shape[-1]))
        model_out = unet_apply_fused(
            unet, params, x, t_emb=emb, use_pallas=use_pallas
        )
        if predict_epsilon:
            x_recon = recip_t * x - recipm1_t * model_out
        else:
            x_recon = model_out
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        x = c1_t * x_recon + c2_t * x + sigma_t * noise
        return x, None

    x, _ = lax.scan(
        body, x, (t_embs, step_noise, recip, recipm1, c1, c2, sigma)
    )
    return x
