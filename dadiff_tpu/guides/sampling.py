"""The sampling engine: conditioning + guidance + dynamics projection fused
into a single jitted ``lax.scan``.

This is the TPU-native replacement for the reference's host-driven loop
(policies.py:114-149 `sample_loop` -> :65-112 `p_sample_with_guidance`):
one compiled XLA program per (shape, config), zero host syncs per denoise
step. It also implements the *intended* dynamics-aware behavior — per-step
projection "x_{i-1} = project(denoise(x_i))" (README.md:22-26) — which the
reference defines (`apply_projection`, policies.py:409-485) but never calls
(SURVEY.md §2.3 #3). ``ProjectionSpec(parity_mode=True)`` reproduces the
reference's as-implemented no-projection sampling for A/B comparisons.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dadiff_tpu.models.diffusion import (
    GaussianDiffusion,
    default_timesteps,
    p_mean_variance,
    q_sample,
)
from dadiff_tpu.ops.projection import NormStats, apply_projection, projection_alpha


class Conditions(NamedTuple):
    """Inpainting conditions: replace trajectory rows where mask is set
    (jit-friendly encoding of the reference's ``{t: value}`` dict,
    policies.py:48-63)."""

    values: jax.Array  # (H, D) or (B, H, D)
    mask: jax.Array  # (H,) bool

    def apply(self, x: jax.Array) -> jax.Array:
        values = self.values
        if values.ndim == x.ndim - 1:
            values = values[None]
        return jnp.where(self.mask[None, :, None], values, x)


def conditions_for_initial_obs(
    normed_obs: jax.Array, observation_dim: int, horizon: int, transition_dim: int
) -> Conditions:
    """Condition row 0 on the current observation, action zeroed — exactly the
    reference's initial condition (policies.py:212-214 zeroes the action slot
    too; that zeroed action is later unnormalized and executed, a quirk we
    preserve for parity). Traceable (usable inside jit)."""
    normed_obs = jnp.atleast_2d(normed_obs)  # (B, obs_dim)
    batch = normed_obs.shape[0]
    row = jnp.zeros((batch, transition_dim), jnp.float32)
    row = row.at[:, :observation_dim].set(normed_obs)
    values = jnp.zeros((batch, horizon, transition_dim), jnp.float32)
    values = values.at[:, 0, :].set(row)
    mask = jnp.zeros((horizon,), bool).at[0].set(True)
    return Conditions(values=values, mask=mask)


def conditions_for_initial_obs_np(
    normed_obs, observation_dim: int, horizon: int, transition_dim: int
) -> Conditions:
    """Host-side (numpy) twin of :func:`conditions_for_initial_obs` for the
    policy replan path: building these tiny arrays with device ops costs
    several host<->device round trips per replan on tunneled TPU setups; as
    numpy they ride along with the single jit call."""
    import numpy as np

    normed_obs = np.atleast_2d(np.asarray(normed_obs, np.float32))
    batch = normed_obs.shape[0]
    values = np.zeros((batch, horizon, transition_dim), np.float32)
    values[:, 0, :observation_dim] = normed_obs
    mask = np.zeros((horizon,), bool)
    mask[0] = True
    return Conditions(values=values, mask=mask)


@dataclasses.dataclass(frozen=True)
class ProjectionSpec:
    """Static projection configuration for the sampler.

    Attributes:
        state_dim: physical state dims (first ``state_dim`` obs dims).
        schedule: 'constant' | 'linear' | 'quadratic' | 'noise_schedule'
            (reference policies.py:358-383).
        strength: max blend strength alpha.
        parity_mode: if True, build the sampler WITHOUT per-step projection,
            matching the reference's as-implemented behavior (its
            apply_projection is dead code) instead of its intended behavior.
        wall_grid: optional occupancy grid (rows, cols) tuple-of-tuples
            (1 = wall). When set, projection is obstacle-aware: rows the
            projection pulls into wall cells revert to their unprojected
            values (ops/projection.apply_projection). Stored as a tuple so
            the spec stays hashable for jit closure.
    """

    state_dim: int
    schedule: str = "noise_schedule"
    strength: float = 1.0
    parity_mode: bool = False
    wall_grid: Optional[Tuple[Tuple[int, ...], ...]] = None
    # wall-collision probe margin (None/0.0 = center-cell-only, the
    # measured-best default; the env's AGENT_RADIUS probes the 4 corners
    # like the env's collision check but over-reverts — see
    # ops/projection.wall_violation_mask)
    wall_margin: Optional[float] = None


def make_sampler(
    diffusion: GaussianDiffusion,
    *,
    guide_fn: Optional[Callable] = None,
    guide_weight: float = 1.0,
    projection: Optional[ProjectionSpec] = None,
    sampling_timesteps: Optional[int] = None,
    sampler: str = "ddpm",
    ddim_eta: float = 0.0,
    warm_start_from: Optional[int] = None,
    jit: bool = True,
):
    """Build ``plan(params, rng, conditions, P, stats) -> (B, H, D)``.

    The returned function is jitted once per batch shape; P and stats are
    runtime arguments (pass ``None``/identity when unused) so the same
    compiled program serves different dynamics.

    Guidance follows reference policies.py:87-97: the gradient of
    ``guide_fn(x, t).sum()`` is added to the posterior mean scaled by
    ``guide_weight * exp(log_variance)`` (variance, not sigma — a reference
    choice we keep).

    ``sampler='ddim'`` runs the strided DDIM update instead of ancestral
    DDPM — conditioning/guidance/projection compose identically, and
    ``sampling_timesteps`` becomes a strided subsequence of the trained
    chain (fast planning at small quality cost). ``sampler='dpmpp'`` is
    DPM-Solver++(2M) (Lu et al., arXiv:2211.01095): deterministic
    second-order multistep in data-prediction space — better few-step
    quality than DDIM at the same model-call budget.

    ``warm_start_from=K`` builds a RECEDING-HORIZON WARM-START sampler
    (SDEdit-style partial chain): the returned plan takes a mandatory
    ``x_init`` — a normalized trajectory, e.g. the previous plan shifted by
    the executed steps — which is forward-noised to the largest remaining
    timestep (q_sample at t=K-1) and denoised through only the timesteps
    ``t < K`` of the configured chain. Cuts model calls per replan by
    ~n_timesteps/K and anchors temporal consistency across replans. New
    capability vs the reference (always samples from pure noise,
    policies.py:114-149); composes with every sampler/guidance/projection.
    """
    schedule = diffusion.schedule
    if sampler == "consistency":
        # few-step multistep consistency sampling (distilled student params;
        # models/consistency.py). sampling_timesteps = model-call budget.
        from dadiff_tpu.models.consistency import make_consistency_sampler

        if guide_fn is not None and guide_weight > 0:
            raise ValueError(
                "the consistency sampler does not support gradient guidance "
                "(no posterior mean to steer); use projection/best-of-N"
            )
        if warm_start_from is not None:
            raise ValueError(
                "consistency sampling is already few-step; it does not "
                "compose with --warm-start-t"
            )
        return make_consistency_sampler(
            diffusion,
            n_steps=int(sampling_timesteps) if sampling_timesteps else 4,
            projection=projection,
            jit=jit,
        )
    if sampler in ("ddim", "dpmpp"):
        n = schedule.n_timesteps
        s = n if sampling_timesteps is None else int(sampling_timesteps)
        if s > n:
            raise ValueError(f"sampling_timesteps ({s}) must be <= {n}")
        import numpy as _np

        if sampler == "dpmpp":
            # DPM-Solver's natural grid is uniform in lambda = log(alpha/
            # sigma) (half-logSNR): the multistep extrapolation ratio
            # r = h_prev/h stays O(1), which uniform-t spacing violates
            # badly at both chain ends (h varies 0.2 -> 6 there, and the
            # second-order term then hurts instead of helping).
            if s >= n:
                taus = _np.arange(n)
            else:
                acp_np = _np.asarray(schedule.alphas_cumprod, _np.float64)
                a_cl = _np.clip(acp_np, 1e-7, 1.0 - 1e-6)
                lams = 0.5 * (_np.log(a_cl) - _np.log1p(-a_cl))
                grid = _np.linspace(lams[n - 1], lams[0], s)
                taus = _np.unique(
                    [int(_np.argmin(_np.abs(lams - g))) for g in grid]
                )
        else:
            taus = _np.unique(_np.linspace(0, n - 1, s).round().astype(_np.int64))
        ts = jnp.asarray(taus[::-1].copy(), jnp.int32)
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
    elif sampler == "ddpm":
        ts = default_timesteps(diffusion.n_timesteps, sampling_timesteps)
        ts_prev = None
    else:
        raise ValueError(f"Unknown sampler: {sampler}")

    if warm_start_from is not None:
        k = int(warm_start_from)
        if not 0 < k <= schedule.n_timesteps:
            raise ValueError(
                f"warm_start_from must be in [1, {schedule.n_timesteps}], got {k}"
            )
        import numpy as _np

        ts_np = _np.asarray(ts)
        keep = ts_np < k
        if not keep.any():
            raise ValueError(
                f"no sampling timesteps below warm_start_from={k} "
                f"(chain timesteps: {ts_np.tolist()})"
            )
        ts = jnp.asarray(ts_np[keep])
        if ts_prev is not None:
            ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
    # static: the timestep x_init is forward-noised to on warm starts
    # (resolved here — inside plan, ts is a traced jit constant)
    warm_t0 = int(ts[0]) if warm_start_from is not None else None
    transition_dim = diffusion.transition_dim
    horizon = diffusion.horizon

    use_projection = projection is not None and not projection.parity_mode
    use_guidance = guide_fn is not None and guide_weight > 0
    wall_grid = (
        jnp.asarray(projection.wall_grid, jnp.int32)
        if use_projection and projection.wall_grid is not None
        else None
    )

    def plan(params, rng, conditions: Conditions, P=None, stats: NormStats = None,
             x_init=None):
        values, mask = conditions
        batch = values.shape[0] if values.ndim == 3 else 1
        shape = (batch, horizon, transition_dim)

        rng, init_key, noise_key = jax.random.split(rng, 3)
        if warm_start_from is not None:
            if x_init is None:
                raise ValueError(
                    "warm-start sampler requires x_init (the previous "
                    "normalized plan, shifted by the executed steps)"
                )
            x_init = jnp.broadcast_to(jnp.asarray(x_init, jnp.float32), shape)
            t0 = jnp.full((batch,), warm_t0, jnp.int32)
            x = q_sample(schedule, x_init, t0, jax.random.normal(init_key, shape))
        else:
            x = jax.random.normal(init_key, shape)
        x = conditions.apply(x)
        # all per-step noise drawn in one fused op outside the scan — inside
        # the body it would serialize a threefry chain per iteration.
        # Deterministic samplers (dpmpp; ddim at eta=0) never consume it, so
        # skip materializing the (T, B, H, D) buffer there.
        if sampler == "dpmpp" or (sampler == "ddim" and ddim_eta == 0.0):
            step_noise = jnp.zeros((ts.shape[0],) + (1,) * len(shape))
            step_noise = jnp.broadcast_to(step_noise, (ts.shape[0],) + shape)
        else:
            step_noise = jax.random.normal(noise_key, (ts.shape[0],) + shape)

        def body(carry, inputs):
            x, x0_prev, h_prev = carry
            t, t_prev, noise = inputs
            t_batch = jnp.full((batch,), t, dtype=jnp.int32)

            model_out = diffusion.apply(params, x, t_batch)
            x0_cur = x0_prev  # overwritten by the solver branches that use it

            if sampler == "dpmpp":
                # DPM-Solver++(2M) (Lu et al., arXiv:2211.01095), data
                # prediction, deterministic multistep: one model call per
                # step, second-order extrapolation from the previous x0.
                acp = schedule.alphas_cumprod
                if diffusion.predict_epsilon:
                    eps = model_out
                else:
                    eps = (
                        schedule.sqrt_recip_alphas_cumprod[t] * x - model_out
                    ) / schedule.sqrt_recipm1_alphas_cumprod[t]
                if use_guidance:
                    grad = jax.grad(lambda x_: jnp.sum(guide_fn(x_, t_batch)))(x)
                    eps = eps - guide_weight * jnp.sqrt(1.0 - acp[t]) * grad
                x0 = (
                    schedule.sqrt_recip_alphas_cumprod[t] * x
                    - schedule.sqrt_recipm1_alphas_cumprod[t] * eps
                )
                if diffusion.clip_denoised:
                    x0 = jnp.clip(x0, -1.0, 1.0)
                x0_cur = x0

                def lam(a):
                    # upper bound must stay < 1 in FLOAT32 (1 - 1e-8 rounds
                    # to exactly 1.0 and log1p(-1) = -inf)
                    a = jnp.clip(a, 1e-7, 1.0 - 1e-6)
                    return 0.5 * (jnp.log(a) - jnp.log1p(-a))

                a_t = acp[t]
                a_next = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
                lam_t, lam_next = lam(a_t), lam(a_next)
                h = lam_next - lam_t
                # second-order extrapolation once a previous x0 exists
                # (h_prev < 0 marks the first step)
                r = h_prev / jnp.where(h == 0, 1.0, h)
                D2 = (1.0 + 1.0 / (2.0 * jnp.maximum(r, 1e-8))) * x0 - (
                    1.0 / (2.0 * jnp.maximum(r, 1e-8))
                ) * x0_prev
                D = jnp.where(h_prev > 0, D2, x0)
                sig_t = jnp.sqrt(jnp.clip(1.0 - a_t, 1e-12))
                sig_next = jnp.sqrt(jnp.clip(1.0 - a_next, 0.0))
                x_upd = (sig_next / sig_t) * x - jnp.sqrt(a_next) * (
                    jnp.exp(-h) - 1.0
                ) * D
                # final step lands exactly on the predicted clean sample:
                # first-order there (standard lower_order_final — the
                # clipped final lambda inflates h, and second-order
                # extrapolation would overshoot outside [-1, 1])
                x_next = jnp.where(t_prev >= 0, x_upd, x0)
                h_prev = h
            elif sampler == "ddim":
                # eps-space classifier guidance (standard form) + strided
                # DDIM update; conditioning/projection identical to DDPM mode
                acp = schedule.alphas_cumprod
                if diffusion.predict_epsilon:
                    eps = model_out
                else:
                    eps = (
                        schedule.sqrt_recip_alphas_cumprod[t] * x - model_out
                    ) / schedule.sqrt_recipm1_alphas_cumprod[t]
                if use_guidance:
                    grad = jax.grad(lambda x_: jnp.sum(guide_fn(x_, t_batch)))(x)
                    eps = eps - guide_weight * jnp.sqrt(1.0 - acp[t]) * grad
                x0 = (
                    schedule.sqrt_recip_alphas_cumprod[t] * x
                    - schedule.sqrt_recipm1_alphas_cumprod[t] * eps
                )
                if diffusion.clip_denoised:
                    x0 = jnp.clip(x0, -1.0, 1.0)
                    eps = (
                        schedule.sqrt_recip_alphas_cumprod[t] * x - x0
                    ) / schedule.sqrt_recipm1_alphas_cumprod[t]
                a_t = acp[t]
                a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
                sigma = (
                    ddim_eta
                    * jnp.sqrt((1 - a_prev) / (1 - a_t))
                    * jnp.sqrt(1 - a_t / a_prev)
                )
                dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
                x_next = jnp.sqrt(a_prev) * x0 + dir_xt
                x_next = x_next + jnp.where(t_prev >= 0, sigma, 0.0) * noise
            else:
                mean, log_var = p_mean_variance(
                    model_out, schedule, x, t_batch,
                    clip_denoised=diffusion.clip_denoised,
                    predict_epsilon=diffusion.predict_epsilon,
                )
                if use_guidance:
                    grad = jax.grad(lambda x_: jnp.sum(guide_fn(x_, t_batch)))(x)
                    mean = mean + guide_weight * jnp.exp(log_var) * grad
                nonzero = (t != 0).astype(x.dtype)
                x_next = mean + nonzero * jnp.exp(0.5 * log_var) * noise

            if use_projection:
                alpha = projection_alpha(
                    t,
                    diffusion.n_timesteps,
                    projection.schedule,
                    projection.strength,
                    schedule.betas,
                )
                x_next = apply_projection(
                    x_next, P, alpha, stats,
                    observation_dim=diffusion.observation_dim,
                    action_dim=diffusion.action_dim,
                    state_dim=projection.state_dim,
                    wall_grid=wall_grid,
                    wall_margin=(
                        projection.wall_margin if use_projection else None
                    ),
                )

            # re-impose hard conditions after every step (policies.py:109-110)
            x_next = conditions.apply(x_next)
            return (x_next, x0_cur, h_prev), None

        tp = ts_prev if ts_prev is not None else jnp.zeros_like(ts)
        carry0 = (x, jnp.zeros_like(x), jnp.asarray(-1.0))
        (x, _, _), _ = lax.scan(body, carry0, (ts, tp, step_noise))
        return x

    if not jit:
        plan.timesteps = ts  # introspection: the resolved reverse-chain steps
        return plan

    warm = warm_start_from is not None
    if use_projection:
        jitted_p = jax.jit(plan)
        if warm:
            out = lambda params, rng, conditions, P=None, stats=None, \
                x_init=None: jitted_p(params, rng, conditions, P, stats, x_init)
        else:
            out = lambda params, rng, conditions, P=None, stats=None: jitted_p(
                params, rng, conditions, P, stats
            )
    elif warm:
        # P/stats unused: close over None so jit doesn't trace dead args
        jitted = jax.jit(
            lambda params, rng, conditions, x_init: plan(
                params, rng, conditions, x_init=x_init
            )
        )
        out = lambda params, rng, conditions, P=None, stats=None, x_init=None: (
            jitted(params, rng, conditions, x_init)
        )
    else:
        jitted = jax.jit(
            lambda params, rng, conditions: plan(params, rng, conditions)
        )
        out = lambda params, rng, conditions, P=None, stats=None: jitted(
            params, rng, conditions
        )
    out.timesteps = ts
    return out
