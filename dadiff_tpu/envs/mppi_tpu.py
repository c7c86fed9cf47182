"""TPU-batched MPPI over the learned neural simulator.

The host MPPI expert (envs/mppi_expert.py) pays ~n_samples * horizon *
frame_skip MuJoCo steps per executed action in Python loops — on a 1-core
host that caps locomotion data at tens of episodes, which round 2 showed is
the binding constraint on diffusion-MPC quality (RESULTS.md: the
data-scaling curve). This module moves the *planning* onto the TPU: the
rollout model is the learned DynamicsMLP simulator (envs/learned_model.py),
so each control step is ONE jitted TPU call evaluating n_samples x batch
candidate sequences on the MXU, and the host pays exactly one `env.step`
per action per environment. With B environments stepped in lockstep the
tunnel RPC amortizes across the batch: ~10^3 more expert episodes per hour
than the host planner at equal sample counts.

Model-based planning on a learned simulator can exploit model error, so
collection is *iterated* (PETS/MBPO-style): plan on the current simulator,
execute on the REAL env, fold the newly gathered on-policy transitions back
into the simulator fit, repeat. Each iteration's data is exactly
on-distribution for the next simulator.

No reference counterpart: the reference downloads Minari expert data
(scripts/download_data.py:118-145) and has no data-generation capability at
all. This is new TPU-native surface, composing two existing pieces
(DynamicsMLP simulator + batched lax.scan rollouts).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


def make_mppi_planner(
    step_fn: Callable,
    reward_done: Callable,
    *,
    act_dim: int,
    horizon: int = 20,
    n_samples: int = 256,
    lam: float = 0.3,
    sigma: float = 0.4,
    n_exec: int = 1,
    noise_beta: float = 0.0,
    smooth_weight: float = 0.0,
    jit: bool = True,
):
    """Build a jitted batched MPPI planner over an arbitrary on-device model.

    Args:
        step_fn: ``(obs (..., d), act (..., m)) -> next_obs (..., d)`` —
            a pure on-device dynamics model (e.g. the learned simulator's
            normalized-delta step, or an analytical model).
        reward_done: ``(obs, next_obs, act) -> (reward (...,), done (...,))``
            (envs/learned_model.py REWARD_MODELS signature).
        act_dim: action dimension m.
        horizon: planning horizon H in control steps.
        n_samples: candidate action sequences per environment per replan.
        lam: MPPI temperature (lower = greedier).
        sigma: exploration std around the nominal sequence; actions clipped
            to [-1, 1].
        n_exec: number of leading actions returned per replan. Executing
            k > 1 actions open-loop between replans divides the host↔device
            round trips by k (the dominant cost on a tunneled TPU) at a
            small closed-loop quality cost.
        noise_beta: AR(1) coefficient of the exploration noise along the
            horizon (0 = white). ``n_t = beta*n_{t-1} + sqrt(1-beta^2)*eps``
            keeps the stationary std at ``sigma`` but low-passes the
            candidate action sequences — the gait-smoothness lever the r4
            physics-engine-data negative identified (RESULTS.md [r4]
            "True-physics MPPI data engine": exact-physics search executes
            jerky bang-bang gaits that do not distill into a diffusion-MPC
            policy).
        smooth_weight: jerk penalty in the candidate score — subtracts
            ``w * sum_t ||a_{t+1} - a_t||^2`` from each candidate's return
            before the MPPI softmax, biasing selection (and therefore the
            executed gait) toward temporally smooth action sequences.

    Returns:
        ``plan(rng, obs (B, d), mean (B, H, m)) -> (actions (B, n_exec, m),
        new_mean (B, H, m))`` — one TPU call per replan. ``new_mean`` is
        the receding-horizon warm start (weighted mean shifted by n_exec,
        tail repeated); feed it back on the next call, and reset it to
        zeros when an environment resets.
    """
    import jax
    import jax.numpy as jnp

    def plan(rng, obs, mean):
        B = obs.shape[0]
        noise = jax.random.normal(rng, (n_samples, B, horizon, act_dim))
        if noise_beta > 0.0:
            # AR(1) low-pass along the horizon, unit stationary variance
            scale = jnp.sqrt(1.0 - noise_beta**2)

            def ar(carry, eps):
                carry = noise_beta * carry + scale * eps
                return carry, carry

            _, colored = jax.lax.scan(
                ar,
                jnp.zeros((n_samples, B, act_dim)),
                jnp.moveaxis(noise, 2, 0),
            )
            noise = jnp.moveaxis(colored, 0, 2)
        seqs = jnp.clip(mean[None] + sigma * noise, -1.0, 1.0)

        obs0 = jnp.broadcast_to(obs[None], (n_samples,) + obs.shape)

        def body(carry, act):
            o, total, alive = carry
            nxt = step_fn(o, act)
            r, done = reward_done(o, nxt, act)
            total = total + r * alive
            alive = alive & ~done
            o = jnp.where(alive[..., None], nxt, o)
            return (o, total, alive), None

        init = (
            obs0,
            jnp.zeros((n_samples, B)),
            jnp.ones((n_samples, B), bool),
        )
        # scan over the horizon; candidates/envs ride the batch axes
        (_, returns, _), _ = jax.lax.scan(
            body, init, jnp.moveaxis(seqs, 2, 0)
        )

        if smooth_weight > 0.0:
            diff = seqs[:, :, 1:] - seqs[:, :, :-1]
            returns = returns - smooth_weight * jnp.sum(
                diff * diff, axis=(2, 3)
            )
        w = jax.nn.softmax((returns - returns.max(0)) / lam, axis=0)  # (N, B)
        new_mean = jnp.einsum("nb,nbhm->bhm", w, seqs)
        actions = jnp.clip(new_mean[:, :n_exec], -1.0, 1.0)
        shifted = jnp.roll(new_mean, -n_exec, axis=1)
        shifted = shifted.at[:, horizon - n_exec :].set(
            new_mean[:, -1:]
        )
        return actions, shifted

    return jax.jit(plan) if jit else plan


def make_sim_step_fn(model, model_params, stats):
    """Physical-space step function from a trained DynamicsMLP + ModelStats."""
    def step_fn(obs, act):
        o_n = (obs - stats.obs_mean) / stats.obs_std
        a_n = (act - stats.act_mean) / stats.act_std
        d_n = model.apply({"params": model_params}, o_n, a_n)
        return obs + d_n * stats.delta_std + stats.delta_mean

    return step_fn


def collect_mppi_tpu_episodes(
    env_name: str,
    n_episodes: int = 100,
    *,
    seed_episodes: Optional[Sequence[dict]] = None,
    max_steps: int = 1000,
    batch_envs: int = 8,
    horizon: int = 20,
    n_samples: int = 256,
    lam: float = 0.3,
    sigma: float = 0.4,
    n_exec: int = 1,
    noise_beta: float = 0.0,
    smooth_weight: float = 0.0,
    explore_sigma: float = 0.0,
    explore_beta: float = 0.0,
    n_iterations: int = 3,
    sim_hidden: Tuple[int, ...] = (256, 256),
    sim_steps: int = 4000,
    sim_ensemble: int = 1,
    dynamics_backend: str = "learned",
    physics_solver_iters: int = 100,
    checkpoint_path: Optional[str] = None,
    seed: int = 0,
    verbose: bool = True,
) -> List[dict]:
    """Iterated TPU-MPPI expert collection on a real Gymnasium env.

    Bootstraps a DynamicsMLP simulator from ``seed_episodes`` (host-MPPI or
    random data), then alternates: plan on the simulator (TPU), execute on
    the real env (host, ``batch_envs`` in lockstep), refit the simulator on
    everything gathered so far. ``explore_sigma`` adds white action noise at
    EXECUTION time to a fraction of the envs (round-2 lesson: noisy-recovery
    data beats uniformly-expert data for diffusion-MPC training).
    ``sim_ensemble > 1`` trains an E-member ensemble and evaluates each MPPI
    candidate under one member (PETS-style trajectory sampling), which
    suppresses single-model exploitation.

    ``noise_beta``/``smooth_weight`` are the planner's gait-smoothness
    levers (see make_mppi_planner); ``explore_beta`` low-passes the
    EXECUTION-time exploration noise the same way (AR(1) across executed
    steps, stationary std ``explore_sigma``) so the recovery-diversity
    noise does not itself inject jerk into the recorded gaits.

    Returns the newly collected episodes (not the seed data), standard
    episode-dict format.
    """
    import gymnasium as gym
    import jax
    import jax.numpy as jnp

    from dadiff_tpu.envs.learned_model import (
        make_ensemble_step_fn,
        reward_model_for,
        train_dynamics_ensemble,
        train_dynamics_model,
    )

    physics_step_fn = None
    if dynamics_backend == "physics":
        # exact planar physics as the rollout model: zero model error, no
        # simulator fit/refit
        from dadiff_tpu.envs.locomotion_jax import (
            make_physics_step_fn,
            physics_env_for,
        )

        # jacobi: parallel solve for the N*B-wide candidate batch;
        # search_model: reduced contacts + 2-edge pyramids (cheap
        # rollouts — EXECUTION stays on the real env, so data quality
        # only depends on candidate ranking fidelity)
        physics_step_fn = make_physics_step_fn(
            physics_env_for(env_name, solver_iters=physics_solver_iters,
                            solver="jacobi", search_model=True)
        )
    elif seed_episodes is None or len(seed_episodes) == 0:
        raise ValueError(
            "collect_mppi_tpu_episodes needs seed_episodes to bootstrap the "
            "simulator (e.g. load_episodes('mppi:...') or 'gym:...')"
        )

    reward_done = reward_model_for(env_name)
    rng = np.random.RandomState(seed)
    pool: List[dict] = list(seed_episodes or [])
    collected: List[dict] = []
    per_iter = max(1, -(-n_episodes // n_iterations))  # ceil: honors n_iterations

    envs = [gym.make(env_name) for _ in range(batch_envs)]
    act_dim = envs[0].action_space.shape[0]
    env_seed = seed * 1000

    try:
        it = 0
        while len(collected) < n_episodes:
            it += 1
            if physics_step_fn is not None:
                if verbose and it == 1:
                    print("[mppi-tpu] exact-physics rollout model "
                          "(no simulator fit)", flush=True)
                step_fn = physics_step_fn
            else:
                if verbose:
                    print(
                        f"[mppi-tpu iter {it}] fitting simulator on "
                        f"{len(pool)} episodes...",
                        flush=True,
                    )
                if sim_ensemble > 1:
                    model, params, stats, metrics = train_dynamics_ensemble(
                        pool,
                        n_models=sim_ensemble,
                        hidden=sim_hidden,
                        n_steps=sim_steps,
                        seed=seed + it,
                    )
                    step_fn = make_ensemble_step_fn(
                        model, params, stats, n_samples
                    )
                else:
                    model, params, stats, metrics = train_dynamics_model(
                        pool,
                        hidden=sim_hidden,
                        n_steps=sim_steps,
                        seed=seed + it,
                    )
                    step_fn = make_sim_step_fn(model, params, stats)
                if verbose:
                    print(
                        f"[mppi-tpu iter {it}] sim one-step R^2 "
                        f"mean={metrics['r2_mean']:.3f} "
                        f"min={metrics['r2_min']:.3f}",
                        flush=True,
                    )
            plan = make_mppi_planner(
                step_fn,
                reward_done,
                act_dim=act_dim,
                horizon=horizon,
                n_samples=n_samples,
                lam=lam,
                sigma=sigma,
                n_exec=n_exec,
                noise_beta=noise_beta,
                smooth_weight=smooth_weight,
            )

            target = min(per_iter, n_episodes - len(collected))
            new_eps = _collect_batch(
                envs,
                plan,
                horizon,
                act_dim,
                target,
                max_steps,
                explore_sigma,
                rng,
                env_seed,
                jnp,
                jax,
                explore_beta=explore_beta,
                verbose=verbose,
                tag=f"iter {it}",
            )
            env_seed += 10 * (target + batch_envs)
            collected.extend(new_eps)
            pool.extend(new_eps)
            if checkpoint_path:
                # long multi-hour collections survive a wedged device
                # call / preemption: everything gathered so far persists
                # after every iteration batch
                from dadiff_tpu.datasets.sources import save_episodes_npz

                save_episodes_npz(checkpoint_path, collected)
                if verbose:
                    print(f"[mppi-tpu] checkpointed {len(collected)} "
                          f"episodes -> {checkpoint_path}", flush=True)
    finally:
        for e in envs:
            e.close()
    return collected


def _inject_state(env, state: np.ndarray) -> np.ndarray:
    """Set a MuJoCo env's simulator to a flat observation-layout state.

    The qpos/qvel split is derived from the model's nq/nv with
    excluded-leading-coordinate handling (locomotion envs drop the root x
    from the observation; Hopper-class envs have odd state dims) — same
    layout rule as dynamics/extractor.py::_set_state. Excluded coordinates
    keep their current simulator values (dynamics are translation-invariant
    in them). Returns the observation after injection.
    """
    unwrapped = env.unwrapped
    unwrapped = getattr(unwrapped, "point_env", unwrapped)
    mj_model = getattr(unwrapped, "model", None)
    if mj_model is None or not hasattr(unwrapped, "set_state"):
        raise NotImplementedError(
            f"state injection needs a MuJoCo env with set_state; got "
            f"{type(unwrapped).__name__}"
        )
    state = np.asarray(state, np.float64)
    nq, nv = int(mj_model.nq), int(mj_model.nv)
    excluded = nq + nv - state.shape[0]
    if excluded < 0 or excluded > nq:
        raise ValueError(
            f"cannot map state dim {state.shape[0]} onto qpos({nq})/qvel({nv})"
        )
    qpos = np.array(unwrapped.data.qpos, np.float64)
    qpos[excluded:] = state[: nq - excluded]
    qvel = state[nq - excluded : nq - excluded + nv]
    unwrapped.set_state(qpos, qvel)
    return np.asarray(state, np.float32)


def dagger_segment_starts(
    visited_episodes: Sequence[dict],
    *,
    stride: int = 25,
    skip_initial: int = 10,
    max_segments: int = 400,
    seed: int = 0,
) -> np.ndarray:
    """Subsample relabeling start states from recorded policy rollouts.

    Takes every ``stride``-th visited observation (skipping the first
    ``skip_initial`` steps, which env.reset already covers), pools across
    episodes, and uniformly subsamples to ``max_segments`` so no single
    long episode dominates the relabeled distribution.
    """
    starts = []
    for ep in visited_episodes:
        obs = np.asarray(ep["observations"], np.float32)
        starts.extend(obs[skip_initial::stride])
    if not starts:
        raise ValueError("no visited states to relabel (episodes too short?)")
    starts = np.stack(starts)
    if len(starts) > max_segments:
        idx = np.random.RandomState(seed).choice(
            len(starts), max_segments, replace=False
        )
        starts = starts[np.sort(idx)]
    return starts


def dagger_relabel_episodes(
    env_name: str,
    visited_episodes: Sequence[dict],
    pool_episodes: Sequence[dict],
    *,
    segment_len: int = 48,
    stride: int = 25,
    skip_initial: int = 10,
    max_segments: int = 400,
    batch_envs: int = 16,
    horizon: int = 12,
    n_samples: int = 1024,
    lam: float = 0.3,
    sigma: float = 0.4,
    n_exec: int = 4,
    sim_hidden: Tuple[int, ...] = (512, 512),
    sim_steps: int = 12000,
    sim_ensemble: int = 4,
    seed: int = 0,
    verbose: bool = True,
) -> List[dict]:
    """DAgger-style on-policy relabeling with the TPU-MPPI expert.

    Round 2 closed every offline-scaling axis (data 2x, horizon 2x,
    candidates 2x, capacity 4x — all flat) and diagnosed the locomotion
    ceiling as the closed-loop gap between the offline data distribution
    and the states the executed diffusion policy visits (RESULTS.md). This
    targets that gap directly: start states are subsampled from the
    *policy's own* recorded rollouts (``evaluate --save-episodes``),
    injected into real MuJoCo envs (translation-invariant coordinates keep
    their reset values), and the TPU-MPPI planner — on an ensemble
    simulator refit on everything gathered so far, visited rollouts
    included — rolls an expert segment of ``segment_len`` real env steps
    from each. The segments are exactly the supervision DAgger prescribes:
    expert behavior on the learner's visited distribution, as dynamically
    consistent (obs, act, rew) windows the diffusion trainer consumes
    unchanged.

    No reference counterpart (the reference has no data-generation
    capability at all, download_data.py:118-145). Returns the relabeled
    segments as standard episode dicts.
    """
    import gymnasium as gym
    import jax
    import jax.numpy as jnp

    from dadiff_tpu.envs.learned_model import (
        make_ensemble_step_fn,
        reward_model_for,
        train_dynamics_ensemble,
        train_dynamics_model,
    )

    starts = dagger_segment_starts(
        visited_episodes,
        stride=stride,
        skip_initial=skip_initial,
        max_segments=max_segments,
        seed=seed,
    )
    if verbose:
        print(
            f"[dagger] {len(starts)} segment starts from "
            f"{len(visited_episodes)} visited episodes",
            flush=True,
        )

    # the simulator must cover the visited distribution: fit on pool +
    # visited rollouts (both are real-env transitions)
    sim_pool = list(pool_episodes) + list(visited_episodes)
    if sim_ensemble > 1:
        model, params, stats, metrics = train_dynamics_ensemble(
            sim_pool, n_models=sim_ensemble, hidden=sim_hidden,
            n_steps=sim_steps, seed=seed,
        )
        step_fn = make_ensemble_step_fn(model, params, stats, n_samples)
    else:
        model, params, stats, metrics = train_dynamics_model(
            sim_pool, hidden=sim_hidden, n_steps=sim_steps, seed=seed,
        )
        step_fn = make_sim_step_fn(model, params, stats)
    if verbose:
        print(
            f"[dagger] sim fit on {len(sim_pool)} episodes: one-step R^2 "
            f"mean={metrics['r2_mean']:.3f} min={metrics['r2_min']:.3f}",
            flush=True,
        )

    envs = [gym.make(env_name) for _ in range(batch_envs)]
    act_dim = envs[0].action_space.shape[0]
    plan = make_mppi_planner(
        step_fn, reward_model_for(env_name), act_dim=act_dim,
        horizon=horizon, n_samples=n_samples, lam=lam, sigma=sigma,
        n_exec=n_exec,
    )

    B = len(envs)
    next_start = 0
    active = np.zeros(B, bool)
    obs = np.zeros((B, starts.shape[1]), np.float32)
    mean = np.zeros((B, horizon, act_dim), np.float32)
    steps = np.zeros(B, int)
    bufs = [None] * B
    segments: List[dict] = []
    key = jax.random.PRNGKey(seed)

    def _start_segment(i):
        nonlocal next_start
        envs[i].reset(seed=seed * 1000 + next_start)
        o = _inject_state(envs[i], starts[next_start])
        next_start += 1
        obs[i] = o
        mean[i] = 0.0
        steps[i] = 0
        bufs[i] = {"obs": [o], "act": [], "rew": []}
        active[i] = True

    def _finish_segment(i):
        seg = {
            "observations": np.stack(bufs[i]["obs"]),
            "actions": np.stack(bufs[i]["act"]),
            "rewards": np.asarray(bufs[i]["rew"], np.float32),
        }
        segments.append(seg)
        active[i] = False
        if verbose and len(segments) % 50 == 0:
            rets = [float(s["rewards"].sum()) for s in segments]
            print(
                f"[dagger] {len(segments)}/{len(starts)} segments, "
                f"mean segment return {np.mean(rets):.1f}",
                flush=True,
            )

    try:
        for i in range(B):
            if next_start < len(starts):
                _start_segment(i)
        while active.any():
            key, sub = jax.random.split(key)
            actions, mean_j = plan(sub, jnp.asarray(obs), jnp.asarray(mean))
            actions = np.array(actions)
            mean = np.array(mean_j)
            for i in range(B):
                if not active[i]:
                    continue
                for k in range(actions.shape[1]):
                    a = actions[i, k].astype(np.float32)
                    o, r, term, trunc, _ = envs[i].step(a)
                    bufs[i]["obs"].append(np.asarray(o, np.float32))
                    bufs[i]["act"].append(a)
                    bufs[i]["rew"].append(float(r))
                    obs[i] = o
                    steps[i] += 1
                    if term or trunc or steps[i] >= segment_len:
                        _finish_segment(i)
                        if next_start < len(starts):
                            _start_segment(i)
                        break
    finally:
        for e in envs:
            e.close()
    return segments


def _collect_batch(
    envs,
    plan,
    horizon,
    act_dim,
    n_episodes,
    max_steps,
    explore_sigma,
    rng,
    env_seed,
    jnp,
    jax,
    explore_beta=0.0,
    verbose=True,
    tag="",
):
    """Run B host envs in lockstep against one jitted planner call per step."""
    B = len(envs)
    obs = np.zeros((B, envs[0].observation_space.shape[0]), np.float32)
    mean = np.zeros((B, horizon, act_dim), np.float32)
    bufs = [
        {"obs": [], "act": [], "rew": []} for _ in range(B)
    ]
    steps = np.zeros(B, int)
    # env i gets execution noise when explore_frac of the batch is "noisy"
    noisy = np.zeros(B, bool)
    if explore_sigma > 0:
        noisy[: max(1, B // 3)] = True
    # AR(1) state of the execution noise (explore_beta > 0: colored noise
    # with stationary std explore_sigma — smooth recovery perturbations)
    exec_noise_state = np.zeros((B, act_dim))
    exec_scale = float(np.sqrt(max(1.0 - explore_beta**2, 0.0)))

    for i in range(B):
        o, _ = envs[i].reset(seed=env_seed + i)
        obs[i] = o
        bufs[i]["obs"].append(np.asarray(o, np.float32))
    next_seed = env_seed + B

    episodes: List[dict] = []
    key = jax.random.PRNGKey(rng.randint(0, 2**31 - 1))
    while len(episodes) < n_episodes:
        key, sub = jax.random.split(key)
        actions, mean_j = plan(sub, jnp.asarray(obs), jnp.asarray(mean))
        actions = np.array(actions)  # writable copies (np.asarray of a JAX
        mean = np.array(mean_j)      # array is a read-only view)
        n_exec = actions.shape[1]
        if explore_sigma > 0:
            if explore_beta > 0:
                cols = []
                for _ in range(n_exec):
                    exec_noise_state[:] = (
                        explore_beta * exec_noise_state
                        + exec_scale * rng.randn(B, act_dim)
                    )
                    cols.append(exec_noise_state.copy())
                noise = np.stack(cols, axis=1) * explore_sigma
            else:
                noise = rng.randn(B, n_exec, act_dim) * explore_sigma
            actions = np.where(
                noisy[:, None, None],
                np.clip(actions + noise, -1.0, 1.0),
                actions,
            )
        for i in range(B):
            # execute up to n_exec planned actions open-loop; stop early if
            # the episode ends (the stale tail of the plan is dropped)
            for k in range(n_exec):
                a = actions[i, k].astype(np.float32)
                o, r, term, trunc, _ = envs[i].step(a)
                bufs[i]["obs"].append(np.asarray(o, np.float32))
                bufs[i]["act"].append(a)
                bufs[i]["rew"].append(float(r))
                obs[i] = o
                steps[i] += 1
                if term or trunc or steps[i] >= max_steps:
                    ep = {
                        "observations": np.stack(bufs[i]["obs"]),
                        "actions": np.stack(bufs[i]["act"]),
                        "rewards": np.asarray(bufs[i]["rew"], np.float32),
                    }
                    episodes.append(ep)
                    if verbose:
                        print(
                            f"[mppi-tpu {tag}] episode {len(episodes)}/"
                            f"{n_episodes}: steps={steps[i]} "
                            f"return={ep['rewards'].sum():.1f}"
                            f"{' (noisy)' if noisy[i] else ''}",
                            flush=True,
                        )
                    o, _ = envs[i].reset(seed=next_seed)
                    next_seed += 1
                    obs[i] = o
                    bufs[i] = {"obs": [np.asarray(o, np.float32)],
                               "act": [], "rew": []}
                    steps[i] = 0
                    mean[i] = 0.0
                    exec_noise_state[i] = 0.0
                    break
            if len(episodes) >= n_episodes:
                break
    return episodes
