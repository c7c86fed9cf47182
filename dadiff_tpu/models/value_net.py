"""Trajectory value function for classifier-guided sampling.

The reference exposes `--value-guidance-weight` and a ValueGuidedPolicy but
never implements value training ("WARNING: Value guidance not yet
implemented", reference train.py:294-298). This module completes the
capability, Diffuser-style: V(x_t, t) regresses the discounted return of the
clean trajectory from its *noised* version at diffusion time t, so its
gradient is meaningful at every step of the reverse process.

Architecture mirrors the denoiser's encoder half: timestep-conditioned
residual conv blocks with stride-2 downsampling, then global pooling + MLP.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dadiff_tpu.models.temporal_unet import (
    ResidualTemporalBlock,
    SinusoidalPosEmb,
    mish,
)
from dadiff_tpu.ops.schedules import DiffusionSchedule
from dadiff_tpu.models.diffusion import q_sample


class ValueNet(nn.Module):
    """(B, H, transition_dim), (B,) timesteps -> (B,) value estimates."""

    transition_dim: int
    dim: int = 32
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array) -> jax.Array:
        t = SinusoidalPosEmb(self.dim, name="time_pos_emb")(time)
        t = nn.Dense(self.dim * 4, dtype=self.dtype, name="time_dense1")(t)
        t = mish(t)
        t = nn.Dense(self.dim, dtype=self.dtype, name="time_dense2")(t)

        x = x.astype(self.dtype)
        for i, mult in enumerate(self.dim_mults):
            x = ResidualTemporalBlock(
                self.dim * mult, self.kernel_size, dtype=self.dtype,
                name=f"enc_{i}_res",
            )(x, t)
            if i < len(self.dim_mults) - 1:
                x = nn.Conv(
                    self.dim * mult, (3,), strides=(2,), padding=[(1, 1)],
                    dtype=self.dtype, name=f"enc_{i}_down",
                )(x)

        x = jnp.mean(x, axis=1)  # global pool over horizon
        x = mish(nn.Dense(self.dim * 4, dtype=self.dtype, name="head1")(x))
        x = nn.Dense(1, dtype=self.dtype, name="head2")(x)
        return x[..., 0].astype(jnp.float32)

    def init_params(self, rng: jax.Array, horizon: int, batch_size: int = 1):
        x = jnp.zeros((batch_size, horizon, self.transition_dim), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.int32)
        return self.init(rng, x, t)["params"]


def value_loss(
    value_net: ValueNet,
    params,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    batch,
) -> jax.Array:
    """MSE between V(q_sample(x0, t), t) and the window's discounted return.

    Batch keys: 'conditions' (B, H, D) normalized trajectories, 'returns'
    (B,) normalized return targets (SequenceDataset include_returns=True).
    """
    x0 = batch["conditions"]
    targets = batch["returns"]
    t_key, noise_key = jax.random.split(rng)
    t = jax.random.randint(t_key, (x0.shape[0],), 0, schedule.n_timesteps)
    noise = jax.random.normal(noise_key, x0.shape)
    x_t = q_sample(schedule, x0, t, noise)
    pred = value_net.apply({"params": params}, x_t, t)
    return jnp.mean((pred - targets) ** 2)


def make_value_guide_fn(
    value_net: ValueNet, value_params
):
    """guide_fn(x, t) for the sampling engine: the per-sample value estimate
    whose gradient steers the reverse process (reference policies.py:264-268
    shape, but over the full noisy trajectory + timestep)."""

    def guide_fn(x, t):
        return value_net.apply({"params": value_params}, x, t)

    return guide_fn
