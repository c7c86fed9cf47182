"""Batched host-env evaluation: N gymnasium episodes in lockstep, one
batched TPU plan per replan wave.

The reference (and our sequential `evaluate_policy`) runs one episode at a
time with batch-1 plans — on a tunneled TPU each replan costs a full host
round trip. Here N envs step together and their replans share a single
batched jit call, amortizing both the round trip and the device compute
(batch-N sampling costs ~the same as batch-1; see RESULTS.md).

Semantics note: episodes are seeded per-env (seed+i), so results are not
episode-for-episode identical to the sequential protocol — use sequential
`evaluate_policy` for reference-protocol A/B numbers and this for fast
sweeps. Best-of-N candidate selection (policy.n_candidates) is supported:
each replan samples N*K plans in one batched call and keeps the best per
env under policy.candidate_scorer (the fully-fused on-device version lives
in envs/rollout.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dadiff_tpu.guides.policies import GuidedPolicy
from dadiff_tpu.guides.sampling import conditions_for_initial_obs_np


def evaluate_policy_batched(
    policy: GuidedPolicy,
    env_name: str,
    n_episodes: int = 10,
    max_steps: int = 300,
    seed: int = 42,
    env_kwargs: Optional[dict] = None,
    verbose: bool = True,
    record_episodes: bool = False,
) -> Dict[str, Any]:
    """Run ``n_episodes`` host-env episodes in lockstep with batched replans.

    Reuses the policy's jitted sampler (and its projection/stats buffers);
    only the batch dimension changes.

    With ``record_episodes=True`` the executed transitions are returned
    under ``metrics["recorded_episodes"]`` as npz-schema episodes
    (processed observations incl. goal-concat, len(obs) = len(act)+1) —
    the self-improvement loop: evaluate the diffusion policy, save its own
    executed episodes, merge into the training set, fine-tune.
    """
    import gymnasium as gym

    try:
        import gymnasium_robotics  # noqa: F401
    except ImportError:
        pass

    envs = [gym.make(env_name, **(env_kwargs or {})) for _ in range(n_episodes)]
    obs_list = []
    for i, env in enumerate(envs):
        obs, _ = env.reset(seed=seed + i)
        obs_list.append(obs)

    horizon = policy.horizon
    obs_dim = policy.observation_dim
    act_dim = policy.action_dim
    trans_dim = policy.transition_dim
    a0, a1 = obs_dim, obs_dim + act_dim
    action_horizon = policy.action_horizon
    start_t = 1 if policy.skip_conditioned_action else 0
    n_buffered = min(action_horizon + 1, horizon) - start_t

    total_reward = np.zeros(n_episodes)
    lengths = np.zeros(n_episodes, dtype=int)
    success = np.zeros(n_episodes, dtype=bool)
    done = np.zeros(n_episodes, dtype=bool)

    rec_obs = rec_act = rec_rew = None
    if record_episodes:
        rec_obs = [[np.ravel(policy._process_observation(o)).astype(np.float32)]
                   for o in obs_list]
        rec_act = [[] for _ in range(n_episodes)]
        rec_rew = [[] for _ in range(n_episodes)]

    n_cand = max(1, getattr(policy, "n_candidates", 1))
    warm_plan = getattr(policy, "_plan_warm", None)
    warm_auto = bool(getattr(policy, "warm_start_auto", False))
    use_warm = warm_plan is not None or warm_auto
    prev_trajs = None  # (N, H, D) last selected plans, for warm-start replans
    prev_shift = 0  # env steps executed since prev_trajs were planned

    step = 0
    while step < max_steps and not done.all():
        # one batched replan for all live envs (plan for all; cheap)
        processed = np.concatenate(
            [policy._process_observation(o) for o in obs_list], axis=0
        )
        normed = policy.normalizer.normalize_observations(processed)

        # Receding-horizon warm start (policy.warm_start_t): re-noise the
        # previous wave's plans, shifted by the steps executed since, and
        # denoise only the short suffix chain.
        x_init = None
        plan_fn = policy._plan
        if use_warm and prev_trajs is not None and prev_shift < horizon:
            x_init = np.concatenate(
                [prev_trajs[:, prev_shift:],
                 np.repeat(prev_trajs[:, -1:], prev_shift, axis=1)],
                axis=1,
            ) if prev_shift > 0 else prev_trajs
            if warm_auto:
                # wave-level adaptive depth: lockstep envs share one K per
                # wave, picked from the 90th-percentile drift across live
                # envs (the conservative envs set the depth: under-noising
                # anchors to stale plans, over-noising just costs calls)
                shift_row = min(prev_shift, horizon - 1)
                drifts = np.linalg.norm(
                    normed - prev_trajs[:, shift_row, :obs_dim], axis=-1
                )
                live = ~done
                d90 = float(np.percentile(drifts[live], 90)) if live.any() \
                    else 0.0
                k = policy._k_from_drift(d90)
                if k is None:
                    x_init = None  # drift too large: full chain this wave
                else:
                    plan_fn = policy._auto_warm_sampler(k)
            else:
                plan_fn = warm_plan

        if n_cand > 1:
            # best-of-N per env: (N*K) plans in one call, best per env kept
            tiled = np.repeat(normed, n_cand, axis=0)
            cond = conditions_for_initial_obs_np(tiled, obs_dim, horizon, trans_dim)
            policy._rng, key = jax.random.split(policy._rng)
            kw = {} if x_init is None else {
                "x_init": np.repeat(x_init, n_cand, axis=0)
            }
            all_trajs = plan_fn(
                policy.params, key, cond, policy._P, policy._stats, **kw
            ).reshape(n_episodes, n_cand, horizon, trans_dim)
            scores = jax.vmap(policy.candidate_scorer)(
                all_trajs, jnp.asarray(normed)
            )  # (N, K)
            best = jnp.argmin(scores, axis=1)
            trajs = np.asarray(
                jnp.take_along_axis(
                    all_trajs, best[:, None, None, None], axis=1
                )[:, 0]
            )  # (N, H, D)
        else:
            cond = conditions_for_initial_obs_np(normed, obs_dim, horizon, trans_dim)
            policy._rng, key = jax.random.split(policy._rng)
            kw = {} if x_init is None else {"x_init": x_init}
            trajs = np.asarray(
                plan_fn(policy.params, key, cond, policy._P, policy._stats, **kw)
            )  # (N, H, D)
        if use_warm:
            prev_trajs = trajs
        if policy.inverse_dynamics is not None:
            # Decision-Diffuser-style: actions from consecutive planned
            # states via the learned inverse model (one batched call)
            stop_t = min(start_t + n_buffered, horizon - 1)
            obs_rows = policy.normalizer.unnormalize_observations(
                trajs[:, start_t : stop_t + 1, :obs_dim].reshape(-1, obs_dim)
            ).reshape(n_episodes, -1, obs_dim)
            if policy.track_planned_states:
                # closed-loop tracking: u_t = g(s_observed, s_planned_next)
                # recomputed per step from the REAL states — one batched
                # inverse-dynamics call per lockstep step across all envs
                planned_next = obs_rows[:, 1:]  # (N, n_exec, obs_dim)
                inv_acts = None
                n_exec = planned_next.shape[1]
            else:
                inv_acts = np.asarray(
                    policy.inverse_dynamics(
                        obs_rows[:, :-1].reshape(-1, obs_dim),
                        obs_rows[:, 1:].reshape(-1, obs_dim),
                    )
                ).reshape(n_episodes, -1, act_dim)
                n_exec = inv_acts.shape[1]
        else:
            actions_norm = trajs[:, start_t : start_t + n_buffered, a0:a1]
            n_exec = n_buffered

        for j in range(n_exec):
            if step >= max_steps or done.all():
                break
            if policy.inverse_dynamics is not None:
                if policy.track_planned_states:
                    # NOTE: the batched inverse-dynamics call includes
                    # already-done envs (their rows are computed but never
                    # executed — the done[i] guard below skips them). Fine
                    # for lockstep waves; masking to live envs would only
                    # save device work late in a run.
                    cur = np.concatenate(
                        [policy._process_observation(o) for o in obs_list],
                        axis=0,
                    )
                    acts = np.asarray(
                        policy.inverse_dynamics(cur, planned_next[:, j])
                    ).reshape(n_episodes, -1)
                else:
                    acts = inv_acts[:, j]
            else:
                acts = policy.normalizer.unnormalize_actions(
                    actions_norm[:, j].reshape(n_episodes, -1)
                )
            for i, env in enumerate(envs):
                if done[i]:
                    continue
                action = np.ravel(acts[i])
                obs, reward, terminated, truncated, info = env.step(action)
                obs_list[i] = obs
                total_reward[i] += float(reward)
                lengths[i] += 1
                if record_episodes:
                    rec_act[i].append(action.astype(np.float32))
                    rec_rew[i].append(np.float32(reward))
                    rec_obs[i].append(
                        np.ravel(policy._process_observation(obs)).astype(
                            np.float32
                        )
                    )
                if isinstance(info, dict) and info.get("success"):
                    success[i] = True
                done[i] = done[i] | bool(terminated) | bool(truncated)
            step += 1
        prev_shift = n_exec

    for env in envs:
        env.close()

    if verbose:
        for i in range(n_episodes):
            print(f"Episode {i + 1}: reward={total_reward[i]:.2f} "
                  f"length={lengths[i]} success={bool(success[i])}")

    metrics = {
        "mean_reward": float(total_reward.mean()),
        "std_reward": float(total_reward.std()),
        "mean_length": float(lengths.mean()),
        "std_length": float(lengths.std()),
        "success_rate": float(success.mean()),
        "episode_rewards": total_reward.tolist(),
        "episode_lengths": lengths.tolist(),
        "episode_success": success.tolist(),
    }
    if record_episodes:
        metrics["recorded_episodes"] = [
            {
                "observations": np.stack(rec_obs[i]),
                "actions": np.stack(rec_act[i]) if rec_act[i]
                else np.zeros((0, act_dim), np.float32),
                "rewards": np.asarray(rec_rew[i], np.float32),
            }
            for i in range(n_episodes)
        ]
    return metrics
