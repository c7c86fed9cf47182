"""Noise schedules and derived DDPM coefficient arrays.

Semantics mirror reference m_diffuser/models/diffusion.py:32-48 (schedules)
and :96-128 (derived buffers), including the cosine clip to [1e-4, 0.9999]
and the posterior variance log-clamp at 1e-20. Everything is precomputed on
host in float64 and stored as a frozen float32 pytree, so the whole schedule
rides along into jit as constants.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class DiffusionSchedule(NamedTuple):
    """Frozen pytree of DDPM coefficients, each of shape (n_timesteps,).

    Mirrors the buffers registered in reference diffusion.py:109-128.
    """

    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def n_timesteps(self) -> int:
        return int(self.betas.shape[0])


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (reference diffusion.py:32-41)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0001, 0.9999)


def linear_beta_schedule(
    timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02
) -> np.ndarray:
    """Ho et al. linear schedule (reference diffusion.py:44-48)."""
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def schedule_from_betas(betas: np.ndarray) -> DiffusionSchedule:
    """Derive all DDPM coefficients from betas (reference diffusion.py:104-128)."""
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([np.ones(1), alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    def f32(x):
        return jnp.asarray(x, dtype=jnp.float32)

    return DiffusionSchedule(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
    )


def make_schedule(n_timesteps: int, beta_schedule: str = "cosine") -> DiffusionSchedule:
    """Build a schedule by name ('linear' | 'cosine'), reference diffusion.py:96-102."""
    if beta_schedule == "linear":
        betas = linear_beta_schedule(n_timesteps)
    elif beta_schedule == "cosine":
        betas = cosine_beta_schedule(n_timesteps)
    else:
        raise ValueError(f"Unknown beta schedule: {beta_schedule}")
    return schedule_from_betas(betas)


def extract(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-sample coefficients and reshape for broadcasting
    (reference `extract`, diffusion.py:15-29).

    Args:
        a: (n_timesteps,) coefficient array.
        t: () or (batch,) integer timesteps.
        ndim: rank of the tensor the result broadcasts against.
    """
    out = a[t]
    if out.ndim == 0:
        return out  # scalar broadcasts against anything
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))
