"""Gaussian diffusion over trajectories — functional core + model wrapper.

TPU-native rebuild of reference m_diffuser/models/diffusion.py:51-294. The
math is identical (including `clip_denoised` to [-1,1], `predict_epsilon`,
and the t==0 noise mask); the structure is not:

  * every step is a pure function over a frozen ``DiffusionSchedule`` pytree
    with explicit PRNG keys,
  * the reverse process ``p_sample_loop`` is a single ``lax.scan`` compiled
    into one XLA program — the reference drives 1 CUDA launch-batch per step
    from Python (diffusion.py:247-249), which is exactly the host-sync
    pattern TPUs punish,
  * sampling-step truncation takes an explicit descending timestep vector
    instead of the reference's unsafe ``n_timesteps`` overwrite
    (evaluate.py:352; out-of-bounds when sampling_timesteps > trained).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.schedules import DiffusionSchedule, extract, make_schedule

ModelApply = Callable[..., jax.Array]  # (params, x, t) -> model output


# ---------------------------------------------------------------------------
# Pure functional core
# ---------------------------------------------------------------------------

def q_sample(
    schedule: DiffusionSchedule,
    x_start: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Forward diffusion q(x_t | x_0) (reference diffusion.py:138-157)."""
    c1 = extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim)
    c2 = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
    return c1 * x_start + c2 * noise


def predict_start_from_noise(
    schedule: DiffusionSchedule, x_t: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """x_0 estimate from x_t and predicted noise (reference diffusion.py:159-166)."""
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(schedule.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def v_from_x0_eps(
    schedule: DiffusionSchedule, x_start: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """v-parameterization target (Salimans & Ho, progressive distillation):
    v = sqrt(alpha_bar_t) * eps - sqrt(1 - alpha_bar_t) * x_0. New capability
    vs the reference (which has only epsilon / x0 prediction)."""
    c1 = extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim)
    c2 = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
    return c1 * noise - c2 * x_start


def epsilon_from_v(
    schedule: DiffusionSchedule, x_t: jax.Array, v: jax.Array, t: jax.Array
) -> jax.Array:
    """Convert a v-prediction to the equivalent epsilon-prediction:
    eps = sqrt(1 - alpha_bar_t) * x_t + sqrt(alpha_bar_t) * v. Lets every
    downstream sampler consume v-models through the epsilon path."""
    c1 = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
    c2 = extract(schedule.sqrt_alphas_cumprod, t, x_t.ndim)
    return c1 * x_t + c2 * v


def q_posterior(
    schedule: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Posterior q(x_{t-1} | x_t, x_0) mean / log-variance
    (reference diffusion.py:168-180)."""
    mean = (
        extract(schedule.posterior_mean_coef1, t, x_t.ndim) * x_start
        + extract(schedule.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    log_var = extract(schedule.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, log_var


def p_mean_variance(
    model_out: jax.Array,
    schedule: DiffusionSchedule,
    x: jax.Array,
    t: jax.Array,
    *,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Reverse-step mean / log-variance given the denoiser output
    (reference diffusion.py:182-203). Takes the model output rather than the
    model so guidance/projection wrappers can reuse it inside one jit."""
    if predict_epsilon:
        x_recon = predict_start_from_noise(schedule, x, t, model_out)
    else:
        x_recon = model_out
    if clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    return q_posterior(schedule, x_recon, x, t)


def p_sample(
    model_mean: jax.Array,
    model_log_variance: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Ancestral sample x_{t-1}, noise masked at t==0
    (reference diffusion.py:205-223)."""
    nonzero = (t != 0).astype(model_mean.dtype)
    nonzero = nonzero.reshape(nonzero.shape + (1,) * (model_mean.ndim - nonzero.ndim))
    return model_mean + nonzero * jnp.exp(0.5 * model_log_variance) * noise


def default_timesteps(n_timesteps: int, sampling_timesteps: Optional[int] = None) -> jax.Array:
    """Descending timestep vector for the reverse scan.

    ``sampling_timesteps == n_timesteps`` gives the full chain. A smaller
    value reproduces the reference's truncation semantics safely (run the
    *last* S steps: t = S-1 .. 0, reference evaluate.py:350-353) — valid only
    for S <= n_timesteps, which we enforce here instead of crashing inside
    `extract` like the reference would.
    """
    s = n_timesteps if sampling_timesteps is None else int(sampling_timesteps)
    if s <= 0:
        raise ValueError(
            f"sampling_timesteps must be positive, got {s} (zero steps would "
            "return the raw Gaussian init as the 'sample')"
        )
    if s > n_timesteps:
        raise ValueError(
            f"sampling_timesteps ({s}) must be <= trained n_timesteps "
            f"({n_timesteps}); the reference silently indexes out of bounds here."
        )
    return jnp.arange(s - 1, -1, -1, dtype=jnp.int32)


def p_sample_loop(
    apply_fn: ModelApply,
    params,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: Tuple[int, ...],
    *,
    timesteps: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
    init_noise: Optional[jax.Array] = None,
    step_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Full reverse diffusion as one ``lax.scan``
    (reference diffusion.py:225-251, host-loop version).

    Args:
        apply_fn: (params, x, t_batch) -> model output.
        shape: (batch, horizon, transition_dim).
        timesteps: descending int32 vector; defaults to the full chain.
        init_noise: optional fixed x_T (for parity tests).
        step_noise: optional (n_steps, *shape) per-step noise (parity tests).
    """
    batch_size = shape[0]
    ts = default_timesteps(schedule.n_timesteps) if timesteps is None else timesteps

    rng, init_key = jax.random.split(rng)
    x = jax.random.normal(init_key, shape) if init_noise is None else init_noise
    if step_noise is None:
        step_keys = jax.random.split(rng, ts.shape[0])
        step_noise = jax.vmap(lambda k: jax.random.normal(k, shape))(step_keys)

    def body(x, inputs):
        t, noise = inputs
        t_batch = jnp.full((batch_size,), t, dtype=jnp.int32)
        model_out = apply_fn(params, x, t_batch)
        mean, log_var = p_mean_variance(
            model_out, schedule, x, t_batch,
            clip_denoised=clip_denoised, predict_epsilon=predict_epsilon,
        )
        x = p_sample(mean, log_var, t_batch, noise)
        return x, None

    x, _ = lax.scan(body, x, (ts, step_noise))
    return x


def ddim_sample_loop(
    apply_fn: ModelApply,
    params,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: Tuple[int, ...],
    *,
    sampling_timesteps: int,
    eta: float = 0.0,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
    init_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """DDIM sampling (Song et al. 2020) over a strided timestep subsequence —
    the principled fast-sampling path the reference lacks (its eval shortens
    the chain by overwriting ``n_timesteps``, evaluate.py:352, which changes
    the marginal the model was trained for; DDIM keeps it).

    eta=0 gives deterministic DDIM; eta=1 recovers DDPM-like stochasticity
    on the subsequence. One ``lax.scan``, like everything else here.
    """
    n = schedule.n_timesteps
    s = int(sampling_timesteps)
    if s > n:
        raise ValueError(f"sampling_timesteps ({s}) must be <= {n}")
    # strided subsequence tau_1 < ... < tau_S (inclusive of 0)
    taus = jnp.asarray(
        np.unique(np.linspace(0, n - 1, s).round().astype(np.int64))[::-1].copy(),
        dtype=jnp.int32,
    )
    taus_prev = jnp.concatenate([taus[1:], jnp.array([-1], jnp.int32)])

    batch_size = shape[0]
    rng, init_key, noise_key = jax.random.split(rng, 3)
    x = jax.random.normal(init_key, shape) if init_noise is None else init_noise
    step_noise = jax.random.normal(noise_key, (taus.shape[0],) + shape)

    acp = schedule.alphas_cumprod

    def body(x, inputs):
        t, t_prev, noise = inputs
        t_batch = jnp.full((batch_size,), t, dtype=jnp.int32)
        model_out = apply_fn(params, x, t_batch)

        if predict_epsilon:
            eps = model_out
            x0 = predict_start_from_noise(schedule, x, t_batch, eps)
        else:
            x0 = model_out
            # recover eps implied by x0
            eps = (
                extract(schedule.sqrt_recip_alphas_cumprod, t_batch, x.ndim) * x - x0
            ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t_batch, x.ndim)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (
                extract(schedule.sqrt_recip_alphas_cumprod, t_batch, x.ndim) * x - x0
            ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t_batch, x.ndim)

        a_t = acp[t]
        a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
        sigma = (
            eta
            * jnp.sqrt((1 - a_prev) / (1 - a_t))
            * jnp.sqrt(1 - a_t / a_prev)
        )
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        x_next = jnp.sqrt(a_prev) * x0 + dir_xt
        x_next = x_next + jnp.where(t_prev >= 0, sigma, 0.0) * noise
        return x_next, None

    x, _ = lax.scan(body, x, (taus, taus_prev, step_noise))
    return x


def diffusion_loss(
    apply_fn: ModelApply,
    params,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    x_start: jax.Array,
    *,
    loss_type: str = "l2",
    predict_epsilon: bool = True,
    prediction: Optional[str] = None,
    weights: Optional[jax.Array] = None,
    t: Optional[jax.Array] = None,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Training loss with uniform random t (reference diffusion.py:253-290).

    ``prediction="v"`` selects the v-parameterization target (apply_fn must
    then be the RAW model, not an epsilon-wrapped one); otherwise
    ``predict_epsilon`` picks epsilon vs x0 as in the reference."""
    batch_size = x_start.shape[0]
    t_key, noise_key = jax.random.split(rng)
    if t is None:
        t = jax.random.randint(t_key, (batch_size,), 0, schedule.n_timesteps)
    if noise is None:
        noise = jax.random.normal(noise_key, x_start.shape)

    x_noisy = q_sample(schedule, x_start, t, noise)
    model_out = apply_fn(params, x_noisy, t)
    if prediction == "v":
        target = v_from_x0_eps(schedule, x_start, noise, t)
    else:
        target = noise if predict_epsilon else x_start

    if loss_type == "l2":
        loss = (model_out - target) ** 2
    elif loss_type == "l1":
        loss = jnp.abs(model_out - target)
    else:
        raise ValueError(f"Unknown loss type: {loss_type}")

    if weights is not None:
        loss = loss * weights
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# Model wrapper (mirrors reference GaussianDiffusion class API)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Static configuration bundle: denoiser module + schedule + dims.

    Unlike the torch reference (an nn.Module holding weights), parameters are
    explicit pytrees passed to each method — the idiomatic JAX shape that
    keeps every method jittable and shardable. Construction mirrors reference
    diffusion.py:62-136.
    """

    model: TemporalUnet
    horizon: int
    observation_dim: int
    action_dim: int
    n_timesteps: int = 1000
    loss_type: str = "l2"
    clip_denoised: bool = True
    predict_epsilon: bool = True
    beta_schedule: str = "cosine"
    # None -> legacy predict_epsilon bool; else "epsilon" | "x0" | "v".
    # With "v", apply() converts the model's v-output to the equivalent
    # epsilon so every downstream sampler (scan/DDIM/DPM++/Picard/guided)
    # works unchanged; loss() trains against the v target.
    prediction: Optional[str] = None
    schedule: DiffusionSchedule = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.schedule is None:
            object.__setattr__(
                self, "schedule", make_schedule(self.n_timesteps, self.beta_schedule)
            )
        if self.prediction is not None:
            if self.prediction not in ("epsilon", "x0", "v"):
                raise ValueError(f"Unknown prediction mode: {self.prediction}")
            # keep the bool coherent for downstream consumers: v-models are
            # consumed through the epsilon path (apply() wraps the output)
            object.__setattr__(
                self, "predict_epsilon", self.prediction != "x0"
            )

    @property
    def transition_dim(self) -> int:
        return self.observation_dim + self.action_dim

    # -- parameter management -------------------------------------------------
    def init_params(self, rng: jax.Array, batch_size: int = 1):
        return self.model.init_params(rng, self.horizon, batch_size)

    def apply(self, params, x: jax.Array, t: jax.Array) -> jax.Array:
        out = self.model.apply({"params": params}, x, t)
        if self.prediction == "v":
            out = epsilon_from_v(self.schedule, x, out, t)
        return out

    # -- diffusion math (delegating to the functional core) --------------------
    def q_sample(self, x_start, t, noise):
        return q_sample(self.schedule, x_start, t, noise)

    def predict_start_from_noise(self, x_t, t, noise):
        return predict_start_from_noise(self.schedule, x_t, t, noise)

    def q_posterior(self, x_start, x_t, t):
        return q_posterior(self.schedule, x_start, x_t, t)

    def p_mean_variance(self, params, x, t):
        model_out = self.apply(params, x, t)
        return p_mean_variance(
            model_out, self.schedule, x, t,
            clip_denoised=self.clip_denoised,
            predict_epsilon=self.predict_epsilon,
        )

    def p_sample_loop(
        self,
        params,
        rng: jax.Array,
        shape: Tuple[int, ...],
        *,
        sampling_timesteps: Optional[int] = None,
        init_noise: Optional[jax.Array] = None,
        step_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        ts = default_timesteps(self.n_timesteps, sampling_timesteps)
        return p_sample_loop(
            self.apply, params, self.schedule, rng, shape,
            timesteps=ts,
            clip_denoised=self.clip_denoised,
            predict_epsilon=self.predict_epsilon,
            init_noise=init_noise,
            step_noise=step_noise,
        )

    def ddim_sample_loop(
        self,
        params,
        rng: jax.Array,
        shape: Tuple[int, ...],
        *,
        sampling_timesteps: int,
        eta: float = 0.0,
        init_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        return ddim_sample_loop(
            self.apply, params, self.schedule, rng, shape,
            sampling_timesteps=sampling_timesteps, eta=eta,
            clip_denoised=self.clip_denoised,
            predict_epsilon=self.predict_epsilon,
            init_noise=init_noise,
        )

    def loss(
        self,
        params,
        rng: jax.Array,
        x_start: jax.Array,
        weights: Optional[jax.Array] = None,
        *,
        t: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        # v-mode trains the RAW model output against the v target; the
        # epsilon-wrapping in self.apply is for sampling only.
        raw_apply = lambda p, x, tt: self.model.apply({"params": p}, x, tt)
        return diffusion_loss(
            raw_apply if self.prediction == "v" else self.apply,
            params, self.schedule, rng, x_start,
            loss_type=self.loss_type,
            predict_epsilon=self.predict_epsilon,
            prediction=self.prediction,
            weights=weights, t=t, noise=noise,
        )
