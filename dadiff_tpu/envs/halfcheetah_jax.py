"""TPU-resident HalfCheetah-v5 on the exact planar physics engine.

Replaces the learned-surrogate locomotion env (envs/learned_model.py) with
TRUE physics: gymnasium-v5 step semantics (5-substep frame skip, forward
x-velocity reward minus 0.1*|a|^2 control cost, no termination) over
dadiff_tpu.envs.planar_physics, whose one-step parity against host
`mujoco.mj_step` is pinned to solver precision (tests/test_planar_physics).

The reference evaluates locomotion by stepping host MuJoCo per action
(reference scripts/evaluate.py:240); this moves the identical dynamics
into the jitted plan->step->replan loop so locomotion joins the mazes in
the zero-host-sync on-device path. State is (qpos, qvel); observations
follow gymnasium's exclude-current-x convention, and `obs_to_state` sets
rootx = 0 (the dynamics and reward are translation-invariant in x).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dadiff_tpu.envs.planar_physics import PlanarPhysics, extract_planar_model


class HalfCheetahJax:
    """Batched, jittable HalfCheetah-v5 with gym step semantics."""

    FRAME_SKIP = 5
    CTRL_COST = 0.1
    FWD_WEIGHT = 1.0

    def __init__(self, solver_iters: int = 100, solver: str = "pgs"):
        self.model = extract_planar_model("HalfCheetah-v5")
        self.phys = PlanarPhysics(self.model, solver_iters=solver_iters,
                                  solver=solver)
        self.dt = self.model.timestep * self.FRAME_SKIP
        self.nq = self.model.nv
        self.obs_dim = 2 * self.model.nv - 1
        self.act_dim = self.model.nu

    # -- obs <-> state ---------------------------------------------------

    def obs_to_state(self, obs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """obs (..., 17) -> (qpos (..., 9), qvel (..., 9)); rootx := 0."""
        nq = self.nq
        qpos = jnp.concatenate(
            [jnp.zeros(obs.shape[:-1] + (1,), obs.dtype), obs[..., : nq - 1]],
            axis=-1,
        )
        return qpos, obs[..., nq - 1 :]

    def state_to_obs(self, qpos: jax.Array, qvel: jax.Array) -> jax.Array:
        return jnp.concatenate([qpos[..., 1:], qvel], axis=-1)

    # -- stepping --------------------------------------------------------

    def step(self, qpos, qvel, action):
        """One env step (single env). Returns (qpos, qvel, obs, reward)."""
        x0 = qpos[0]
        qpos, qvel = self.phys.env_step(qpos, qvel, action, self.FRAME_SKIP)
        x_vel = (qpos[0] - x0) / self.dt
        reward = (self.FWD_WEIGHT * x_vel
                  - self.CTRL_COST * jnp.sum(action**2))
        return qpos, qvel, self.state_to_obs(qpos, qvel), reward

    def step_batch(self, qpos, qvel, action):
        """Vectorized step over a leading batch axis."""
        return jax.vmap(self.step)(qpos, qvel, action)

    def rollout(self, qpos0, qvel0, actions):
        """Open-loop rollout: actions (B, K, nu) -> (obs (B, K, obs_dim),
        rewards (B, K)). One lax.scan over time, vmapped batch inside."""

        def body(carry, a):
            qp, qv = carry
            qp, qv, obs, rew = self.step_batch(qp, qv, a)
            return (qp, qv), (obs, rew)

        _, (obs, rew) = jax.lax.scan(
            body, (qpos0, qvel0), jnp.swapaxes(actions, 0, 1)
        )
        return jnp.swapaxes(obs, 0, 1), jnp.swapaxes(rew, 0, 1)


def make_physics_step_fn(env: HalfCheetahJax):
    """Physical-space step function for the MPPI planner (mppi_tpu.py).

    Same contract as make_sim_step_fn: ``(obs (..., d), act (..., m)) ->
    next_obs`` over arbitrary leading batch axes — but the dynamics are
    the exact planar physics, so the engine's planning model has ZERO
    model error (the r2 engine's binding constraint was the learned
    simulator's compounding error). Construct the env with
    solver='jacobi' for wide-batch rollouts.
    """

    def step_fn(obs, act):
        lead = obs.shape[:-1]
        o = obs.reshape((-1, obs.shape[-1]))
        a = act.reshape((-1, act.shape[-1]))
        qpos, qvel = env.obs_to_state(o)
        _, _, nobs, _ = env.step_batch(qpos, qvel, a)
        return nobs.reshape(lead + (nobs.shape[-1],))

    return step_fn


def make_physics_locomotion_evaluator(
    diffusion,
    env: HalfCheetahJax,
    *,
    action_horizon: int = 8,
    n_replans: int = 25,
    sampling_timesteps: Optional[int] = None,
    sampler: str = "ddpm",
    skip_conditioned_action: bool = False,
    jit: bool = True,
    mesh=None,
    batch_axis: str = "dp",
):
    """True-physics on-device plan->step->replan (HalfCheetah).

    Same contract as learned_model.make_ondevice_locomotion_evaluator:
    ``evaluate(params, rng, norm_stats, init_obs) -> (mean_return,
    mean_length, returns)`` — but the env inside the scan is the exact
    planar physics, so returns are REAL (same dynamics as host MuJoCo),
    not model-based surrogates. init_obs comes from real host resets.
    """
    from dadiff_tpu.guides.sampling import (
        conditions_for_initial_obs,
        make_sampler,
    )

    plan = make_sampler(
        diffusion, sampling_timesteps=sampling_timesteps, sampler=sampler,
        jit=False,
    )
    obs_dim = diffusion.observation_dim
    act_dim = diffusion.action_dim
    horizon = diffusion.horizon
    trans_dim = diffusion.transition_dim
    # host MPC protocol compatibility: --skip-conditioned-action starts
    # execution at plan row 1 (guides/policies.py:390)
    start_t = 1 if skip_conditioned_action else 0
    if start_t + action_horizon > horizon:
        raise ValueError("action_horizon must fit in the planning horizon")

    batch_shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_shard = NamedSharding(mesh, PartitionSpec(batch_axis))

    def evaluate(params, rng, norm_stats, init_obs):
        obs = jnp.asarray(init_obs)
        if batch_shard is not None:
            obs = jax.lax.with_sharding_constraint(obs, batch_shard)
        batch = obs.shape[0]
        qpos, qvel = env.obs_to_state(obs)
        total = jnp.zeros((batch,))
        length = jnp.zeros((batch,))

        def macro(carry, key):
            qpos, qvel, total, length = carry
            obs = env.state_to_obs(qpos, qvel)
            normed = (obs - norm_stats.obs_mean) / norm_stats.obs_std
            cond = conditions_for_initial_obs(normed, obs_dim, horizon,
                                              trans_dim)
            traj = plan(params, key, cond)
            acts_n = traj[:, start_t:start_t + action_horizon,
                          obs_dim:obs_dim + act_dim]
            acts = acts_n * norm_stats.action_std + norm_stats.action_mean

            def env_step(inner, a):
                qp, qv, total, length = inner
                qp, qv, _, reward = env.step_batch(qp, qv, a)
                return (qp, qv, total + reward, length + 1.0), None

            (qpos, qvel, total, length), _ = jax.lax.scan(
                env_step, (qpos, qvel, total, length),
                jnp.swapaxes(acts, 0, 1),
            )
            return (qpos, qvel, total, length), None

        keys = jax.random.split(rng, n_replans)
        (qpos, qvel, total, length), _ = jax.lax.scan(
            macro, (qpos, qvel, total, length), keys
        )
        return jnp.mean(total), jnp.mean(length), total

    if jit:
        return jax.jit(evaluate)
    return evaluate
