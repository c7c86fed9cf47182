"""Consistency distillation: few-step planning distilled from a trained
DDPM teacher (Song et al., "Consistency Models", arXiv:2303.01469; improved
recipe from iCT, arXiv:2310.14189).

New capability with no reference counterpart — the reference cannot even
shorten its chain safely (its eval truncation indexes out of bounds,
/root/reference/scripts/evaluate.py:352). Here a student network learns the
consistency function f(x_t, t) -> x_0 of the teacher's probability-flow ODE,
so a plan costs 1-4 model calls instead of 100, and the few-step samples
stay near the teacher's manifold (unlike strided DDIM, which degrades fast
below ~10 calls on this task — RESULTS.md fast-sampling curve).

TPU-first design decisions:
  * the whole multistep consistency sampler is one jitted program (a tiny
    unrolled loop of N model calls — no scan needed at N<=8);
  * the distillation train step reuses the fused trainer
    (loss+grad+clip+adam in one donated jit); the TrainState's EMA slot IS
    the CD target network theta^- (stop-gradient);
  * the teacher runs inside the same jit as the student forward/backward —
    XLA overlaps both on the MXU; no host round trips.

Discrete-time adaptation: the teacher grid is its own trained DDPM chain
(T=100 here). In VP terms x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps, the
VE-equivalent noise level is sigma_t = sqrt((1-acp_t)/acp_t) with
x_t / sqrt(acp_t) = x0 + sigma_t eps, so the EDM/CM boundary scalings
c_skip/c_out apply on the rescaled input.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dadiff_tpu.models.diffusion import (
    GaussianDiffusion,
    predict_start_from_noise,
    q_sample,
)
from dadiff_tpu.ops.schedules import extract


def sigma_of_t(schedule, t: jax.Array) -> jax.Array:
    """VE-equivalent noise level of discrete chain step t:
    sigma_t = sqrt((1 - acp_t) / acp_t)."""
    acp = jnp.clip(schedule.alphas_cumprod[t], 1e-8, 1.0 - 1e-8)
    return jnp.sqrt((1.0 - acp) / acp)


def consistency_scalings(schedule, t: jax.Array, sigma_data: float = 0.5):
    """Boundary scalings evaluated at the chain's sigma_t, folded with the
    VP->VE input rescale 1/sqrt(acp_t):

        f(x, t) = coef_x * x + c_out * x0_net(x, t)

    with c_skip = sd^2/(sigma^2+sd^2), coef_x = c_skip/sqrt(acp_t), and
    c_out = 1 - c_skip — a convex blend of the rescaled input x_hat (itself
    x0 + sigma*eps) and the network's x0 prediction. Properties: at
    sigma -> 0 f(x, t) -> x_hat (the exact CM boundary); at the chain top
    f -> x0_net, so a student initialized from the teacher starts as the
    teacher's one-call x0 estimate — the init that makes CD converge in a
    few epochs.
    """
    acp = jnp.clip(schedule.alphas_cumprod[t], 1e-8, 1.0 - 1e-8)
    sigma2 = (1.0 - acp) / acp
    sd2 = sigma_data * sigma_data
    c_skip = sd2 / (sigma2 + sd2)
    coef_x = c_skip / jnp.sqrt(acp)
    return coef_x, 1.0 - c_skip


def make_consistency_fn(diffusion: GaussianDiffusion, sigma_data: float = 0.5):
    """Build f(params, x, t_batch) -> x0 estimate.

    F_theta is the same architecture as the teacher (raw VP-space input, no
    c_in rescale) so the student initializes FROM the teacher weights — at
    init, F(x, t) is the teacher's prediction and f starts close to a
    one-step teacher denoise, which is what makes CD converge in a few
    epochs instead of from scratch.
    """
    schedule = diffusion.schedule

    def f(params, x: jax.Array, t_batch: jax.Array) -> jax.Array:
        out = diffusion.apply(params, x, t_batch)  # eps-space (v converted)
        if diffusion.predict_epsilon:
            x0_net = predict_start_from_noise(schedule, x, t_batch, out)
        else:
            x0_net = out
        coef_x, c_out = consistency_scalings(schedule, t_batch, sigma_data)
        coef_x = coef_x.reshape(coef_x.shape + (1,) * (x.ndim - 1))
        c_out = c_out.reshape(c_out.shape + (1,) * (x.ndim - 1))
        val = coef_x * x + c_out * x0_net
        if diffusion.clip_denoised:
            val = jnp.clip(val, -1.0, 1.0)
        return val

    return f


def teacher_ddim_step(
    diffusion: GaussianDiffusion, teacher_params, x: jax.Array,
    t: jax.Array, t_prev: jax.Array,
) -> jax.Array:
    """One deterministic (probability-flow) DDIM step of the teacher from
    chain step t to t_prev (same update as guides/sampling.py's ddim branch,
    eta=0)."""
    schedule = diffusion.schedule
    out = diffusion.apply(teacher_params, x, t)
    if diffusion.predict_epsilon:
        eps = out
        x0 = predict_start_from_noise(schedule, x, t, eps)
    else:
        x0 = out
        eps = (
            extract(schedule.sqrt_recip_alphas_cumprod, t, x.ndim) * x - x0
        ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, x.ndim)
    if diffusion.clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
        eps = (
            extract(schedule.sqrt_recip_alphas_cumprod, t, x.ndim) * x - x0
        ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, x.ndim)
    a_prev = extract(schedule.alphas_cumprod, t_prev, x.ndim)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(
        jnp.clip(1.0 - a_prev, 0.0)
    ) * eps


def make_cd_loss(
    diffusion: GaussianDiffusion,
    teacher_params,
    *,
    sigma_data: float = 0.5,
    huber_c: Optional[float] = None,
    skip_steps: int = 1,
):
    """Consistency-distillation objective over chain pairs (t, t-k),
    t ~ U{k, T-1}, k = ``skip_steps`` (LCM's skipping-step, arXiv:2310.04378
    — a larger teacher gap gives a stronger consistency signal per pair):

        d( f_theta(x_t, t),  f_{theta^-}(x_hat_{t-k}, t-k) )

    with x_hat_{t-k} ONE deterministic teacher DDIM step from x_t across the
    gap, theta^- the EMA target (stop-gradient), d the pseudo-Huber metric
    sqrt(||.||^2 + c^2) - c (iCT §3.3; c scaled to the trajectory dim), and
    the iCT weighting 1/(sigma_t - sigma_{t-k}).

    Returns ``loss(params, batch, rng, target_params)`` for
    make_train_step(loss_takes_ema=True) — the TrainState's EMA slot is the
    target network.
    """
    schedule = diffusion.schedule
    if not 1 <= skip_steps < schedule.n_timesteps:
        raise ValueError(
            f"skip_steps must be in [1, {schedule.n_timesteps - 1}], "
            f"got {skip_steps}"
        )
    f = make_consistency_fn(diffusion, sigma_data)
    teacher_params = jax.device_put(teacher_params)
    k = int(skip_steps)

    def loss(params, batch, rng, target_params):
        x0 = batch["conditions"]
        b = x0.shape[0]
        t_key, n_key = jax.random.split(rng)
        t = jax.random.randint(t_key, (b,), k, schedule.n_timesteps)
        noise = jax.random.normal(n_key, x0.shape)
        x_t = q_sample(schedule, x0, t, noise)
        x_prev = teacher_ddim_step(diffusion, teacher_params, x_t, t, t - k)

        pred = f(params, x_t, t)
        target = jax.lax.stop_gradient(
            f(target_params, x_prev, t - k)
        )

        c = huber_c
        if c is None:
            # iCT: c = 0.00054 * sqrt(data dim)
            c = 0.00054 * float(np.sqrt(np.prod(x0.shape[1:])))
        d = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=(1, 2)) + c * c) - c
        w = 1.0 / jnp.clip(sigma_of_t(schedule, t) - sigma_of_t(schedule, t - k),
                           1e-4)
        value = jnp.mean(w * d)
        return value, {"consistency": value}

    return loss


def consistency_noise_levels(
    n_timesteps: int, n_steps: int, rho: float = 2.0
) -> np.ndarray:
    """Descending chain steps for N-call multistep consistency sampling:
    first call at the chain top, then polynomially-decaying re-noise levels
    t_i = round((T-1) * ((N-i)/N)^rho), i=1..N-1 — each subsequent call
    refines at a lower noise level, never wasting a call at t=0 (where f is
    the identity by construction)."""
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    levels = [n_timesteps - 1]
    for i in range(1, n_steps):
        lvl = max(1, int(round((n_timesteps - 1) * ((n_steps - i) / n_steps) ** rho)))
        # For small T / large N the polynomial grid can collide or hit t=0
        # (where f is the identity): drop those calls rather than waste them.
        if lvl < levels[-1]:
            levels.append(lvl)
    return np.asarray(levels, np.int64)


def make_consistency_sampler(
    diffusion: GaussianDiffusion,
    *,
    n_steps: int = 4,
    projection=None,
    rho: float = 2.0,
    sigma_data: float = 0.5,
    jit: bool = True,
):
    """Few-step plan function with the make_sampler signature:
    ``plan(params, rng, conditions, P=None, stats=None) -> (B, H, D)``.

    ``params`` are the DISTILLED student weights. Hard inpainting conditions
    are re-imposed on every x0 estimate and every re-noised iterate (same
    policy as the DDPM scan); per-step dynamics projection applies to each
    x0 estimate at that call's chain step, so projection/wall-aware/
    best-of-N all compose exactly as with the full chain.
    """
    from dadiff_tpu.guides.sampling import Conditions  # noqa: F401 (signature)
    from dadiff_tpu.ops.projection import apply_projection, projection_alpha

    schedule = diffusion.schedule
    f = make_consistency_fn(diffusion, sigma_data)
    levels = consistency_noise_levels(schedule.n_timesteps, n_steps, rho)
    horizon, transition_dim = diffusion.horizon, diffusion.transition_dim
    use_projection = projection is not None and not projection.parity_mode
    wall_grid = (
        jnp.asarray(projection.wall_grid, jnp.int32)
        if use_projection and projection.wall_grid is not None
        else None
    )

    def _project(x0, t, P, stats):
        alpha = projection_alpha(
            jnp.asarray(t), diffusion.n_timesteps, projection.schedule,
            projection.strength, schedule.betas,
        )
        return apply_projection(
            x0, P, alpha, stats,
            observation_dim=diffusion.observation_dim,
            action_dim=diffusion.action_dim,
            state_dim=projection.state_dim,
            wall_grid=wall_grid,
            wall_margin=projection.wall_margin,
        )

    def plan(params, rng, conditions, P=None, stats=None):
        values, mask = conditions
        batch = values.shape[0] if values.ndim == 3 else 1
        shape = (batch, horizon, transition_dim)
        keys = jax.random.split(rng, n_steps)

        x = jax.random.normal(keys[0], shape)
        x = conditions.apply(x)
        x0 = None
        for i, t in enumerate(levels):
            if i > 0:  # re-noise the current estimate down to level t
                t_b = jnp.full((batch,), int(t), jnp.int32)
                x = q_sample(schedule, x0, t_b, jax.random.normal(keys[i], shape))
                x = conditions.apply(x)
            t_b = jnp.full((batch,), int(t), jnp.int32)
            x0 = f(params, x, t_b)
            if use_projection:
                x0 = _project(x0, int(t), P, stats)
            x0 = conditions.apply(x0)
        return x0

    if not jit:
        plan.timesteps = jnp.asarray(levels)
        return plan

    if use_projection:
        out = jax.jit(plan)
    else:
        jitted = jax.jit(lambda params, rng, conditions: plan(params, rng, conditions))
        out = lambda params, rng, conditions, P=None, stats=None: jitted(
            params, rng, conditions
        )
    out.timesteps = jnp.asarray(levels)
    return out
