"""TPU-resident locomotion envs on the exact planar physics engine.

Replaces the learned-surrogate locomotion env (envs/learned_model.py) with
TRUE physics for all three reference locomotion tasks: gymnasium-v5 step
semantics (frame skip, finite-difference forward reward, control cost,
healthy bonus/termination) over dadiff_tpu.envs.planar_physics, whose
one-step parity against host `mujoco.mj_step` is machine-precision
(tests/test_planar_physics.py, tests/test_locomotion_jax.py) — HalfCheetah
under MuJoCo's Euler-with-implicit-damping, Hopper/Walker2d under RK4.

The reference evaluates locomotion by stepping host MuJoCo per action
(reference scripts/evaluate.py:240); this moves the identical dynamics
into the jitted plan->step->replan loop so locomotion joins the mazes in
the zero-host-sync on-device path. State is (qpos, qvel); observations
follow gymnasium's conventions (exclude current x; Hopper/Walker clip
qvel to ±10), and `obs_to_state` sets rootx = 0 (dynamics and reward are
translation-invariant in x).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dadiff_tpu.envs.planar_physics import PlanarPhysics, extract_planar_model


class PlanarGymEnv:
    """Batched, jittable gymnasium-v5 locomotion env on exact physics.

    Subclasses define ENV_NAME / FRAME_SKIP / reward constants /
    healthy(), and optionally VEL_CLIP (gym clips Hopper/Walker qvel in
    the observation) and SEARCH_GEOMS (cheap MPPI rollout contact set).
    """

    ENV_NAME: str = ""
    FRAME_SKIP: int = 5
    CTRL_COST: float = 0.1
    FWD_WEIGHT: float = 1.0
    HEALTHY_REWARD: float = 0.0
    VEL_CLIP: Optional[float] = None
    SEARCH_GEOMS: Optional[Tuple[str, ...]] = None

    def __init__(self, solver_iters: int = 100, solver: str = "pgs",
                 search_model: bool = False):
        """``search_model=True`` builds the cheaper rollout model for
        planning search: restricted contact set + 2-edge friction
        pyramids (several times less constraint-solver HBM traffic at
        wide batch). Keep the default exact model for anything whose
        returns are quoted."""
        self.model = extract_planar_model(
            self.ENV_NAME,
            contact_geoms=self.SEARCH_GEOMS if search_model else None,
        )
        self.phys = PlanarPhysics(self.model, solver_iters=solver_iters,
                                  solver=solver,
                                  pyramid_edges=2 if search_model else 4)
        self.dt = self.model.timestep * self.FRAME_SKIP
        self.nq = self.model.nv
        self.obs_dim = 2 * self.model.nv - 1
        self.act_dim = self.model.nu

    # -- obs <-> state ---------------------------------------------------

    def obs_to_state(self, obs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """obs (..., 2nq-1) -> (qpos (..., nq), qvel (..., nq)); rootx=0."""
        nq = self.nq
        qpos = jnp.concatenate(
            [jnp.zeros(obs.shape[:-1] + (1,), obs.dtype), obs[..., : nq - 1]],
            axis=-1,
        )
        return qpos, obs[..., nq - 1 :]

    def state_to_obs(self, qpos: jax.Array, qvel: jax.Array) -> jax.Array:
        if self.VEL_CLIP is not None:
            qvel = jnp.clip(qvel, -self.VEL_CLIP, self.VEL_CLIP)
        return jnp.concatenate([qpos[..., 1:], qvel], axis=-1)

    # -- env semantics ---------------------------------------------------

    def healthy(self, qpos: jax.Array, qvel: jax.Array) -> jax.Array:
        """is_healthy per gymnasium-v5; True = keep going (never done
        here; subclasses override)."""
        return jnp.ones(qpos.shape[:-1], bool)

    def step(self, qpos, qvel, action):
        """One env step (single env). Returns (qpos, qvel, obs, reward,
        done). Gym semantics: fwd reward from the x delta over the full
        frame-skip, ctrl cost on the action, healthy bonus while alive,
        terminate when unhealthy."""
        x0 = qpos[0]
        qpos, qvel = self.phys.env_step(qpos, qvel, action, self.FRAME_SKIP)
        x_vel = (qpos[0] - x0) / self.dt
        healthy = self.healthy(qpos, qvel)
        reward = (self.FWD_WEIGHT * x_vel
                  + self.HEALTHY_REWARD * healthy
                  - self.CTRL_COST * jnp.sum(action**2))
        return qpos, qvel, self.state_to_obs(qpos, qvel), reward, ~healthy

    def step_batch(self, qpos, qvel, action):
        """Vectorized step over a leading batch axis."""
        return jax.vmap(self.step)(qpos, qvel, action)

    def rollout(self, qpos0, qvel0, actions):
        """Open-loop rollout: actions (B, K, nu) -> (obs (B, K, obs_dim),
        rewards (B, K)). One lax.scan over time, vmapped batch inside.
        (No termination masking — used for recorded-action replay where
        the source data was alive.)"""

        def body(carry, a):
            qp, qv = carry
            qp, qv, obs, rew, _ = self.step_batch(qp, qv, a)
            return (qp, qv), (obs, rew)

        _, (obs, rew) = jax.lax.scan(
            body, (qpos0, qvel0), jnp.swapaxes(actions, 0, 1)
        )
        return jnp.swapaxes(obs, 0, 1), jnp.swapaxes(rew, 0, 1)


class HalfCheetahJax(PlanarGymEnv):
    ENV_NAME = "HalfCheetah-v5"
    FRAME_SKIP = 5
    CTRL_COST = 0.1
    HEALTHY_REWARD = 0.0
    SEARCH_GEOMS = ("bthigh", "bshin", "bfoot", "fthigh", "fshin", "ffoot")


class HopperJax(PlanarGymEnv):
    ENV_NAME = "Hopper-v5"
    FRAME_SKIP = 4
    CTRL_COST = 1e-3
    HEALTHY_REWARD = 1.0
    VEL_CLIP = 10.0
    SEARCH_GEOMS = ("foot_geom", "leg_geom")

    def healthy(self, qpos, qvel):
        z, angle = qpos[..., 1], qpos[..., 2]
        state = jnp.concatenate([qpos[..., 2:], qvel], axis=-1)
        return ((z > 0.7) & (jnp.abs(angle) < 0.2)
                & jnp.all(jnp.abs(state) < 100.0, axis=-1))


class Walker2dJax(PlanarGymEnv):
    ENV_NAME = "Walker2d-v5"
    FRAME_SKIP = 4
    CTRL_COST = 1e-3
    HEALTHY_REWARD = 1.0
    VEL_CLIP = 10.0
    SEARCH_GEOMS = ("foot_geom", "leg_geom", "foot_left_geom",
                    "leg_left_geom")

    def healthy(self, qpos, qvel):
        z, angle = qpos[..., 1], qpos[..., 2]
        return (z > 0.8) & (z < 2.0) & (jnp.abs(angle) < 1.0)


PHYSICS_ENVS = {
    "halfcheetah": HalfCheetahJax,
    "hopper": HopperJax,
    "walker": Walker2dJax,
}


def physics_env_for(env_name: str, **kwargs) -> PlanarGymEnv:
    key = env_name.lower()
    for name, cls in PHYSICS_ENVS.items():
        if name in key:
            return cls(**kwargs)
    raise ValueError(f"no TPU physics env for {env_name}")


def make_physics_step_fn(env: PlanarGymEnv):
    """Physical-space step function for the MPPI planner (mppi_tpu.py).

    Same contract as make_sim_step_fn: ``(obs (..., d), act (..., m)) ->
    next_obs`` over arbitrary leading batch axes — but the dynamics are
    the exact planar physics, so the engine's planning model has ZERO
    model error (the r2 engine's binding constraint was the learned
    simulator's compounding error). Construct the env with
    solver='jacobi' (+ search_model=True) for wide-batch rollouts.
    """

    def step_fn(obs, act):
        lead = obs.shape[:-1]
        o = obs.reshape((-1, obs.shape[-1]))
        a = act.reshape((-1, act.shape[-1]))
        qpos, qvel = env.obs_to_state(o)
        _, _, nobs, _, _ = env.step_batch(qpos, qvel, a)
        return nobs.reshape(lead + (nobs.shape[-1],))

    return step_fn


def make_physics_locomotion_evaluator(
    diffusion,
    env: PlanarGymEnv,
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
    """True-physics on-device plan->step->replan.

    Same contract as learned_model.make_ondevice_locomotion_evaluator:
    ``evaluate(params, rng, norm_stats, init_obs) -> (mean_return,
    mean_length, returns)`` — but the env inside the scan is the exact
    planar physics, so returns are REAL (same dynamics as host MuJoCo),
    not model-based surrogates. init_obs comes from real host resets.
    Done envs freeze (reward and length masked), matching gym
    termination.
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
        alive = jnp.ones((batch,), bool)

        def macro(carry, key):
            qpos, qvel, total, length, alive = carry
            obs = env.state_to_obs(qpos, qvel)
            normed = (obs - norm_stats.obs_mean) / norm_stats.obs_std
            cond = conditions_for_initial_obs(normed, obs_dim, horizon,
                                              trans_dim)
            traj = plan(params, key, cond)
            acts_n = traj[:, start_t:start_t + action_horizon,
                          obs_dim:obs_dim + act_dim]
            acts = acts_n * norm_stats.action_std + norm_stats.action_mean

            def env_step(inner, a):
                qp, qv, total, length, alive = inner
                nqp, nqv, _, reward, done = env.step_batch(qp, qv, a)
                total = total + reward * alive
                length = length + alive
                alive = alive & ~done
                # frozen envs keep their last state (masked step)
                qp = jnp.where(alive[:, None], nqp, qp)
                qv = jnp.where(alive[:, None], nqv, qv)
                return (qp, qv, total, length, alive), None

            (qpos, qvel, total, length, alive), _ = jax.lax.scan(
                env_step, (qpos, qvel, total, length, alive),
                jnp.swapaxes(acts, 0, 1),
            )
            return (qpos, qvel, total, length, alive), None

        keys = jax.random.split(rng, n_replans)
        (qpos, qvel, total, length, alive), _ = jax.lax.scan(
            macro, (qpos, qvel, total, length, alive), keys
        )
        return jnp.mean(total), jnp.mean(length), total

    if jit:
        return jax.jit(evaluate)
    return evaluate
