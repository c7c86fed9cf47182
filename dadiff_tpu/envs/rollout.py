"""Fully on-device plan->step->replan (the BASELINE.json north-star loop).

The reference's eval loop crosses the host boundary thousands of times per
episode: 500 python-driven denoise steps per replan + a CPU MuJoCo step per
action (evaluate.py:235-240, SURVEY.md §3.2). Here the entire loop — reverse
diffusion, action extraction, env physics — is one jitted program over a
batch of environments: two nested lax.scans (macro: replans; inner: env
steps), zero host syncs until the final metrics fetch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from dadiff_tpu.envs.pointmaze_jax import GOAL_THRESHOLD, PointMazeJax
from dadiff_tpu.guides.sampling import (
    ProjectionSpec,
    conditions_for_initial_obs,
    make_sampler,
)
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.ops.projection import NormStats


class RolloutMetrics(NamedTuple):
    success_rate: jax.Array  # () fraction of envs that ever reached the goal
    mean_reward: jax.Array  # () mean total reward per env
    mean_final_distance: jax.Array  # () mean distance to goal at end
    per_env_reward: Optional[jax.Array] = None  # (B,) total reward per env
    per_env_success: Optional[jax.Array] = None  # (B,) bool ever-at-goal


def make_ondevice_evaluator(
    diffusion: GaussianDiffusion,
    env: PointMazeJax,
    *,
    action_horizon: int = 8,
    n_replans: int = 16,
    sampling_timesteps: Optional[int] = None,
    projection: Optional[ProjectionSpec] = None,
    n_candidates: int = 1,
    warm_start_t: Optional[int] = None,
    sampler: str = "ddpm",
    jit: bool = True,
    mesh=None,
    batch_axis: str = "dp",
    use_megakernel: bool = False,
    P=None,
    stats: Optional[NormStats] = None,
    mega_group_chains: int = 64,
    mega_interpret: bool = False,
):
    """Build ``evaluate(params, rng, stats, batch_size, P=None) ->
    (RolloutMetrics, final_state)`` running ``n_replans`` plan->act cycles of
    ``action_horizon`` env steps each, entirely on device.

    ``n_candidates > 1`` plans B*N trajectories per replan wave in one batched
    call and executes, per env, the candidate whose final position is closest
    to the goal (best-of-N selection fused into the loop).

    ``stats`` (NormStats) maps between env physical space and the model's
    normalized trajectory space.

    ``mesh`` shards the env batch (and thus every per-env intermediate,
    including the planner fan-out) over ``batch_axis`` — the BASELINE
    configs[4] topology: N vmapped guided samplers + on-device rollouts
    across the chip mesh. batch_size must divide by the axis size.

    ``warm_start_t=K`` warm-starts every replan after the first: the first
    plan of each rollout runs the full chain (hoisted out of the macro
    scan), then the scanned replans re-noise the previous selected plan —
    shifted by ``action_horizon`` — to timestep K and denoise only t<K
    (guides/sampling.py warm-start semantics, fused on device).
    """
    mega_plan = None
    if use_megakernel:
        # whole replan wave (all candidates, conditioning, per-step
        # projection, best-of-N selection) through ONE pallas_call
        # (ops/pallas_planner.py) instead of the XLA scan sampler
        if sampler != "ddpm":
            raise ValueError("--megakernel supports the ddpm sampler only")
        if warm_start_t is not None:
            raise ValueError("--megakernel does not compose with warm start")
        if mesh is not None:
            raise ValueError("--megakernel is the single-chip latency path")
        if projection is not None and not projection.parity_mode and (
            P is None or stats is None
        ):
            raise ValueError(
                "megakernel projection needs P and stats at build time"
            )
        from dadiff_tpu.ops.pallas_planner import make_pallas_bo_sampler

        mega_plan = make_pallas_bo_sampler(
            diffusion,
            projection_spec=projection,
            P=P,
            stats=stats,
            n_candidates=n_candidates,
            group_chains=mega_group_chains,
            sampling_timesteps=sampling_timesteps,
            interpret=mega_interpret,
            weight_dtype=jnp.float32 if mega_interpret else jnp.bfloat16,
        )

    plan = make_sampler(
        diffusion,
        projection=projection,
        sampling_timesteps=sampling_timesteps,
        sampler=sampler,
        jit=False,
    )
    plan_warm = (
        make_sampler(
            diffusion,
            projection=projection,
            sampling_timesteps=sampling_timesteps,
            sampler=sampler,
            warm_start_from=warm_start_t,
            jit=False,
        )
        if warm_start_t is not None
        else None
    )
    obs_dim = diffusion.observation_dim
    act_dim = diffusion.action_dim
    horizon = diffusion.horizon
    trans_dim = diffusion.transition_dim
    if action_horizon > horizon:
        raise ValueError("action_horizon must be <= planning horizon")

    batch_shard = None
    if mesh is not None:
        from dadiff_tpu.parallel.mesh import batch_sharding

        batch_shard = batch_sharding(mesh, batch_axis)

    def evaluate(params, rng, stats: NormStats, batch_size: int, P=None):
        mega_prepared = (
            mega_plan.prepare(params) if mega_plan is not None else None
        )
        rng, reset_key = jax.random.split(rng)
        state, obs = env.reset(reset_key, batch_size)
        if batch_shard is not None:
            constrain = lambda a: jax.lax.with_sharding_constraint(a, batch_shard)
            state = jax.tree_util.tree_map(constrain, state)
            obs = constrain(obs)
        total_reward = jnp.zeros((batch_size,))
        succeeded = jnp.zeros((batch_size,), bool)

        def make_macro(plan_fn, use_warm):
            def macro_step(carry, key):
                state, obs, total_reward, succeeded, traj_prev = carry

                normed_obs = (obs - stats.obs_mean) / stats.obs_std
                x_init = None
                if use_warm:
                    # previous selected plan shifted by the executed steps,
                    # tail-padded with its final row
                    x_init = jnp.concatenate(
                        [
                            traj_prev[:, action_horizon:],
                            jnp.repeat(
                                traj_prev[:, -1:], action_horizon, axis=1
                            ),
                        ],
                        axis=1,
                    )
                if mega_plan is not None:
                    cond = conditions_for_initial_obs(
                        normed_obs, obs_dim, horizon, trans_dim
                    )
                    traj = mega_plan(
                        params, key, cond, prepared=mega_prepared
                    )
                elif n_candidates > 1:
                    tiled = jnp.repeat(normed_obs, n_candidates, axis=0)
                    cond = conditions_for_initial_obs(
                        tiled, obs_dim, horizon, trans_dim
                    )
                    if use_warm:
                        trajs = plan_fn(
                            params, key, cond, P, stats,
                            x_init=jnp.repeat(x_init, n_candidates, axis=0),
                        )
                    else:
                        trajs = plan_fn(params, key, cond, P, stats)
                    trajs = trajs.reshape(
                        batch_size, n_candidates, horizon, trans_dim
                    )
                    # score: final predicted position vs goal in PHYSICAL
                    # space (normalized-space distance is not monotone in
                    # physical distance when stat blocks differ); the env
                    # carry holds the physical goal exactly
                    goal = state.goal  # (B, 2) physical
                    final_pos = (
                        trajs[:, :, -1, 0:2] * stats.obs_std[0:2]
                        + stats.obs_mean[0:2]
                    )  # (B, N, 2)
                    scores = jnp.linalg.norm(final_pos - goal[:, None], axis=-1)
                    best = jnp.argmin(scores, axis=1)  # (B,)
                    traj = jnp.take_along_axis(
                        trajs, best[:, None, None, None], axis=1
                    )[:, 0]
                else:
                    cond = conditions_for_initial_obs(
                        normed_obs, obs_dim, horizon, trans_dim
                    )
                    if use_warm:
                        traj = plan_fn(params, key, cond, P, stats, x_init=x_init)
                    else:
                        traj = plan_fn(params, key, cond, P, stats)

                # actions for the next action_horizon steps (physical space)
                acts_norm = traj[:, :action_horizon, obs_dim : obs_dim + act_dim]
                acts = acts_norm * stats.action_std + stats.action_mean

                def env_step(inner, a):
                    state, obs, total_reward, succeeded = inner
                    state, obs, reward, _ = env.step(state, a)
                    total_reward = total_reward + reward
                    dist = jnp.linalg.norm(state.pos - state.goal, axis=-1)
                    succeeded = succeeded | (dist <= GOAL_THRESHOLD)
                    return (state, obs, total_reward, succeeded), None

                (state, obs, total_reward, succeeded), _ = lax.scan(
                    env_step,
                    (state, obs, total_reward, succeeded),
                    jnp.swapaxes(acts, 0, 1),  # (A, B, act_dim)
                )
                return (state, obs, total_reward, succeeded, traj), None

            return macro_step

        keys = jax.random.split(rng, n_replans)
        carry = (
            state, obs, total_reward, succeeded,
            jnp.zeros((batch_size, horizon, trans_dim)),
        )
        if plan_warm is None:
            carry, _ = lax.scan(make_macro(plan, False), carry, keys)
        else:
            # first replan runs the full chain (hoisted out of the scan);
            # the scanned replans warm-start from the carried plan
            carry, _ = make_macro(plan, False)(carry, keys[0])
            carry, _ = lax.scan(make_macro(plan_warm, True), carry, keys[1:])
        state, obs, total_reward, succeeded, _ = carry

        final_dist = jnp.linalg.norm(state.pos - state.goal, axis=-1)
        metrics = RolloutMetrics(
            success_rate=jnp.mean(succeeded.astype(jnp.float32)),
            mean_reward=jnp.mean(total_reward),
            mean_final_distance=jnp.mean(final_dist),
            per_env_reward=total_reward,
            per_env_success=succeeded,
        )
        return metrics, state

    if jit:
        return jax.jit(evaluate, static_argnames=("batch_size",))
    return evaluate
