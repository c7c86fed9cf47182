"""Dynamics projection as pure jit-side ops.

The reference defines trajectory projection (policies.py:409-485) but never
wires it into sampling (SURVEY.md §2.3 #3); here it is a pure function
designed to live *inside* the sampling ``lax.scan`` body — unnormalize ->
concatenated layout -> x @ P -> blend -> renormalize — exactly the per-step
"x_{i-1} = project(denoise(x_i))" the paper/README describe (README.md:22-26).

Layout quirks preserved deliberately for parity (they shift success metrics
if changed): the concatenated trajectory duplicates the final state
(policies.py:443, losses/__init__.py:153) and projection runs in PHYSICAL
(unnormalized) space (policies.py:413, losses/__init__.py:58).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class NormStats(NamedTuple):
    """Normalization statistics as device arrays (from DatasetNormalizer)."""

    obs_mean: jax.Array
    obs_std: jax.Array
    action_mean: jax.Array
    action_std: jax.Array

    @classmethod
    def from_normalizer(cls, normalizer) -> "NormStats":
        return cls(
            obs_mean=jnp.asarray(normalizer.obs_mean, jnp.float32),
            obs_std=jnp.asarray(normalizer.obs_std, jnp.float32),
            action_mean=jnp.asarray(normalizer.action_mean, jnp.float32),
            action_std=jnp.asarray(normalizer.action_std, jnp.float32),
        )

    @classmethod
    def identity(cls, observation_dim: int, action_dim: int) -> "NormStats":
        return cls(
            obs_mean=jnp.zeros((observation_dim,), jnp.float32),
            obs_std=jnp.ones((observation_dim,), jnp.float32),
            action_mean=jnp.zeros((action_dim,), jnp.float32),
            action_std=jnp.ones((action_dim,), jnp.float32),
        )


def to_concatenated(states: jax.Array, actions: jax.Array) -> jax.Array:
    """Interleaved -> concatenated layout [x0..xT, u0..u_{T-1}] with the final
    state duplicated (reference losses/__init__.py:137-159).

    states: (B, H, n); actions: (B, H, m) -> (B, (H+1)n + Hm)
    """
    batch = states.shape[0]
    states_ext = jnp.concatenate([states, states[:, -1:, :]], axis=1)
    return jnp.concatenate(
        [states_ext.reshape(batch, -1), actions.reshape(batch, -1)], axis=1
    )


def from_concatenated(
    x_concat: jax.Array, horizon: int, state_dim: int, action_dim: int
) -> Tuple[jax.Array, jax.Array]:
    """Inverse of :func:`to_concatenated`, dropping the duplicated final state
    (reference policies.py:457-465)."""
    batch = x_concat.shape[0]
    states_size = (horizon + 1) * state_dim
    states = x_concat[:, :states_size].reshape(batch, horizon + 1, state_dim)[:, :-1]
    actions = x_concat[:, states_size:].reshape(batch, horizon, action_dim)
    return states, actions


def projection_alpha(
    t: jax.Array,
    n_timesteps: int,
    schedule: str = "constant",
    strength: float = 1.0,
    betas: Optional[jax.Array] = None,
) -> jax.Array:
    """Projection blending strength at diffusion timestep t
    (reference policies.py:358-383). ``schedule`` is static; t may be traced."""
    progress = t.astype(jnp.float32) / n_timesteps
    if schedule == "constant":
        return jnp.asarray(strength, jnp.float32) * jnp.ones_like(progress)
    if schedule == "linear":
        return strength * (1.0 - progress)
    if schedule == "quadratic":
        return strength * (1.0 - progress) ** 2
    if schedule == "noise_schedule":
        if betas is None:
            raise ValueError("noise_schedule requires betas")
        return jnp.sqrt(1.0 - betas[t]) * strength
    raise ValueError(f"Unknown projection schedule: {schedule}")


def wall_violation_mask(
    positions: jax.Array, wall_grid: jax.Array, margin: Optional[float] = None
) -> jax.Array:
    """(..., 2) physical xy -> bool mask, True where the position lies in a
    wall cell; with ``margin > 0`` the 4 margin-offset corners are probed
    like the env's own collision check (PointMazeJax._is_wall).

    Default margin 0 (center-cell only) is an EMPIRICAL choice: probing at
    the agent radius is env-consistent but measured worse on Medium
    (wall-aware bo8 0.58/0.52 vs 0.44/0.26 across two seed sets, n=50) —
    grazing rows still benefit from the dynamics projection because the env
    slides along walls rather than failing, so reverting them costs more
    than the collision it avoids. Grid layout follows gymnasium-robotics
    maze maps (origin at maze center, y up / row down)."""
    from dadiff_tpu.envs.pointmaze_jax import xy_to_cell

    if margin is None:
        margin = 0.0
    Hm, Wm = wall_grid.shape
    if margin == 0.0:
        row, col = xy_to_cell(positions, Hm, Wm)
        return wall_grid[row, col] == 1
    hit = jnp.zeros(positions.shape[:-1], bool)
    for dx in (-margin, margin):
        for dy in (-margin, margin):
            row, col = xy_to_cell(
                positions + jnp.asarray([dx, dy], positions.dtype), Hm, Wm
            )
            hit = hit | (wall_grid[row, col] == 1)
    return hit


def apply_projection(
    x: jax.Array,
    P: jax.Array,
    alpha: jax.Array,
    stats: NormStats,
    *,
    observation_dim: int,
    action_dim: int,
    state_dim: int,
    wall_grid: Optional[jax.Array] = None,
    wall_margin: Optional[float] = None,
) -> jax.Array:
    """Project a normalized interleaved trajectory onto the dynamics subspace.

    Faithful to the *intended* reference behavior (policies.py:409-485):
      1. split obs/actions, take the first ``state_dim`` obs dims as state,
      2. unnormalize to physical space,
      3. concatenated layout (duplicated last state) -> x @ P,
      4. blend alpha * Px + (1-alpha) * x (physical space),
      5. renormalize and re-interleave; non-state obs dims (e.g. goals) pass
         through untouched.

    Obstacle-aware extension (no reference counterpart): with ``wall_grid``,
    any horizon row whose blended position falls inside a wall cell reverts
    to its unprojected value — the linear subspace knows dynamics but not
    obstacles, and in wall-dense mazes an unconstrained projection drags
    plans through walls (the round-1 PointMaze_Medium regression).

    Args:
        x: (B, H, observation_dim + action_dim) normalized trajectory.
        P: ((H+1)n + Hm, (H+1)n + Hm) projection matrix.
        alpha: scalar (or ()-shaped traced) blend strength.
        wall_grid: optional (rows, cols) int occupancy grid (1 = wall).
    """
    horizon = x.shape[1]

    obs_norm = x[..., :observation_dim]
    act_norm = x[..., observation_dim:]
    states_norm = obs_norm[..., :state_dim]
    rest_obs = obs_norm[..., state_dim:]

    s_mean, s_std = stats.obs_mean[:state_dim], stats.obs_std[:state_dim]
    states_phys = states_norm * s_std + s_mean
    actions_phys = act_norm * stats.action_std + stats.action_mean

    xc = to_concatenated(states_phys, actions_phys)
    x_proj = xc @ P
    xc = alpha * x_proj + (1.0 - alpha) * xc

    new_states, new_actions = from_concatenated(xc, horizon, state_dim, action_dim)

    if wall_grid is not None:
        # revert rows the projection dragged into walls (state + action)
        bad = wall_violation_mask(
            new_states[..., :2], wall_grid, margin=wall_margin
        )  # (B, H)
        keep = ~bad
        new_states = jnp.where(keep[..., None], new_states, states_phys)
        new_actions = jnp.where(keep[..., None], new_actions, actions_phys)

    states_norm = (new_states - s_mean) / s_std
    act_norm = (new_actions - stats.action_mean) / stats.action_std

    obs_norm = jnp.concatenate([states_norm, rest_obs], axis=-1)
    return jnp.concatenate([obs_norm, act_norm], axis=-1)


def projection_residual(
    x: jax.Array,
    P: jax.Array,
    stats: NormStats,
    *,
    observation_dim: int,
    action_dim: int,
    state_dim: int,
) -> jax.Array:
    """Mean-squared dynamics violation ||tau - P tau||^2 in physical space —
    the ProjectionLoss integrand (reference losses/__init__.py:161-186)."""
    obs_norm = x[..., :observation_dim]
    act_norm = x[..., observation_dim:]
    states_norm = obs_norm[..., :state_dim]

    s_mean, s_std = stats.obs_mean[:state_dim], stats.obs_std[:state_dim]
    states_phys = states_norm * s_std + s_mean
    actions_phys = act_norm * stats.action_std + stats.action_mean

    xc = to_concatenated(states_phys, actions_phys)
    return jnp.mean((xc - xc @ P) ** 2)
