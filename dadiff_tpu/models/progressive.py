"""Progressive distillation (Salimans & Ho, arXiv:2202.00512), discrete-time.

MEASURED NEGATIVE (r5, RESULTS.md): at matched few-call budgets the
PD student never beats the un-distilled teacher's DDIM grid on
either task family (UMaze 0.36→ties/degrades; HalfCheetah -114 vs
-47 at 10 calls). Kept as the documented ablation; the shipping
few-call recipe is consistency distillation (models/consistency.py).

Round 2 measured consistency distillation failing outright on HalfCheetah
(CM 1-call -570 vs teacher +87.8; RESULTS.md "locomotion: distillation does
NOT transfer") — the 1-call self-consistency map has to span the whole
chain at once, which 23-dim locomotion trajectories do not admit. PD makes
a strictly easier ask: each ROUND only halves the step count — the student
learns to match TWO teacher DDIM steps with ONE of its own, then becomes
the next round's teacher (100 -> 50 -> 25 -> 12 -> 6 calls). Error
compounds per round instead of all-at-once.

Discrete-time mechanics on the trained T-step DDPM chain:
  * student grid = the EXACT ddim grid make_sampler builds for
    ``sampling_timesteps=S`` (guides/sampling.py:201), so the distilled
    student is evaluated with the stock ``--sampler ddim
    --sampling-timesteps S`` path, projection/best-of-N composing
    unchanged;
  * for a student step t -> s (with mid m = the pair's midpoint level),
    the teacher runs the 2-step DDIM path t -> m -> s and the student's
    x0-prediction target is the value that makes its ONE DDIM step land on
    the teacher's endpoint:
        x0* = (x_s - (sigma_s/sigma_t) x_t) / (alpha_s - (sigma_s/sigma_t) alpha_t)
    (alpha = sqrt(acp), sigma = sqrt(1-acp); the terminal level s = -1 is
    the clean sample: alpha=1, sigma=0 -> x0* = x_s);
  * truncated-SNR weighting w = max(alpha_t^2/sigma_t^2, 1) (the paper's
    recommended loss weight).

No reference counterpart (the reference has no fast sampling at all; its
truncation is out-of-bounds-unsafe, evaluate.py:350-353).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dadiff_tpu.models.diffusion import GaussianDiffusion, extract, q_sample


def ddim_grid(n_timesteps: int, n_steps: int) -> np.ndarray:
    """Descending chain levels, identical to make_sampler's ddim grid."""
    taus = np.unique(
        np.linspace(0, n_timesteps - 1, n_steps).round().astype(np.int64)
    )
    return taus[::-1].copy()


def pd_pairs(n_timesteps: int, n_steps: int) -> np.ndarray:
    """(S, 3) int array of (t_hi, t_mid, t_lo) per student step; the
    terminal t_lo is -1 (the clean level) and t_mid is the midpoint level
    the teacher passes through."""
    ts = ddim_grid(n_timesteps, n_steps)
    lo = np.concatenate([ts[1:], np.array([-1])])
    mid = np.where(lo >= 0, (ts + lo) // 2, ts // 2)
    # the midpoint must sit strictly between (degenerate adjacent levels
    # collapse the teacher's second step to a no-op — harmless but wasted)
    mid = np.clip(mid, np.maximum(lo, 0), ts)
    return np.stack([ts, mid, lo], axis=1).astype(np.int64)


def _alpha_sigma(schedule, t, ndim):
    """(sqrt(acp_t), sqrt(1-acp_t)) with the t = -1 terminal mapped to the
    clean level (alpha=1, sigma=0)."""
    acp = extract(schedule.alphas_cumprod, jnp.maximum(t, 0), ndim)
    clean = (t < 0).reshape((-1,) + (1,) * (ndim - 1))
    acp = jnp.where(clean, 1.0, acp)
    return jnp.sqrt(acp), jnp.sqrt(jnp.clip(1.0 - acp, 0.0))


def ddim_jump(diffusion: GaussianDiffusion, params, x, t, t_next):
    """One deterministic DDIM step t -> t_next with a safe terminal
    (t_next = -1 lands exactly on the x0 prediction)."""
    schedule = diffusion.schedule
    out = diffusion.apply(params, x, t)
    recip = extract(schedule.sqrt_recip_alphas_cumprod, t, x.ndim)
    recipm1 = extract(schedule.sqrt_recipm1_alphas_cumprod, t, x.ndim)
    if diffusion.predict_epsilon:
        x0 = recip * x - recipm1 * out
    else:
        x0 = out
    if diffusion.clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    eps = (recip * x - x0) / recipm1
    a_next, s_next = _alpha_sigma(schedule, t_next, x.ndim)
    return a_next * x0 + s_next * eps


def make_pd_loss(
    diffusion: GaussianDiffusion,
    teacher_params,
    n_student_steps: int,
):
    """Loss for ONE progressive-distillation round.

    The teacher is FIXED for the round (pass the previous round's student);
    the trained student becomes the next round's teacher at half the step
    count. Batch protocol matches the trainer's standard
    ``loss(params, batch, rng)``.
    """
    schedule = diffusion.schedule
    pairs = jnp.asarray(
        pd_pairs(schedule.n_timesteps, n_student_steps), jnp.int32
    )
    teacher_params = jax.device_put(teacher_params)

    def loss(params, batch, rng):
        x0 = batch["conditions"]
        b = x0.shape[0]
        j_key, n_key = jax.random.split(rng)
        j = jax.random.randint(j_key, (b,), 0, pairs.shape[0])
        t, t_mid, t_lo = pairs[j, 0], pairs[j, 1], pairs[j, 2]

        noise = jax.random.normal(n_key, x0.shape)
        x_t = q_sample(schedule, x0, t, noise)

        # two teacher DDIM steps: t -> mid -> lo
        x_mid = ddim_jump(diffusion, teacher_params, x_t, t, t_mid)
        x_lo = ddim_jump(diffusion, teacher_params, x_mid, t_mid, t_lo)
        x_lo = jax.lax.stop_gradient(x_lo)

        a_t, s_t = _alpha_sigma(schedule, t, x0.ndim)
        a_lo, s_lo = _alpha_sigma(schedule, t_lo, x0.ndim)
        ratio = s_lo / s_t
        denom = a_lo - ratio * a_t
        # adjacent-level degenerate pairs (t == t_lo after rounding) have
        # denom ~ 0; guard (they do not occur on sane grids)
        denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        x0_star = (x_lo - ratio * x_t) / denom

        out = diffusion.apply(params, x_t, t)
        recip = extract(schedule.sqrt_recip_alphas_cumprod, t, x0.ndim)
        recipm1 = extract(schedule.sqrt_recipm1_alphas_cumprod, t, x0.ndim)
        if diffusion.predict_epsilon:
            x0_pred = recip * x_t - recipm1 * out
        else:
            x0_pred = out

        snr = (a_t / s_t) ** 2
        w = jnp.maximum(snr, 1.0)
        value = jnp.mean(w * (x0_pred - x0_star) ** 2)
        return value, {"progressive": value}

    return loss


def pd_round_schedule(n_timesteps: int, target_steps: int) -> list:
    """Halving schedule from the full chain down to ``target_steps``:
    e.g. T=100, target 6 -> [50, 25, 12, 6]."""
    if not 1 <= target_steps < n_timesteps:
        raise ValueError(
            f"target_steps must be in [1, {n_timesteps - 1}], got {target_steps}"
        )
    rounds = []
    s = n_timesteps
    while s > target_steps:
        s = max(target_steps, s // 2)
        rounds.append(s)
    return rounds
