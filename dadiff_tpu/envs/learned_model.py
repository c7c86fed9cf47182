"""Learned neural dynamics for on-device locomotion rollouts.

The maze on-device loop (envs/rollout.py) steps an analytical pure-JAX env;
locomotion has no such closed form and MJX is absent from this image, so the
TPU-resident equivalent is a *learned simulator*: a small MLP trained on the
same transition data the planner trains on, predicting normalized delta-obs
from (obs, action). Rewards/termination are computed from observations with
the env's documented reward structure (forward velocity is an observed qvel
component for HalfCheetah/Hopper/Walker2d), so the whole plan->step->replan
loop runs on device with zero host syncs.

No reference counterpart: the reference steps host MuJoCo per action
(evaluate.py:235-240). Host-env MPC evaluation remains the ground-truth
protocol (scripts/evaluate.py); this module is the throughput path and
reports *model-based* (surrogate) returns.

Observation layouts (gymnasium MuJoCo v5, exclude_current_positions=True):
    HalfCheetah-v5: obs[0:8]=qpos[1:], obs[8:17]=qvel  -> x_vel = obs[8]
    Hopper-v5:      obs[0:5]=qpos[1:], obs[5:11]=qvel  -> x_vel = obs[5]
    Walker2d-v5:    obs[0:8]=qpos[1:], obs[8:17]=qvel  -> x_vel = obs[8]
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class DynamicsMLP(nn.Module):
    """(obs, action) -> delta_obs, all in normalized space."""

    obs_dim: int
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs: jax.Array, act: jax.Array) -> jax.Array:
        x = jnp.concatenate([obs, act], axis=-1)
        for h in self.hidden:
            x = nn.swish(nn.Dense(h)(x))
        return nn.Dense(self.obs_dim)(x)


class ModelStats(NamedTuple):
    """Normalization statistics for the learned simulator (device arrays)."""

    obs_mean: jax.Array
    obs_std: jax.Array
    act_mean: jax.Array
    act_std: jax.Array
    delta_mean: jax.Array
    delta_std: jax.Array


def _chunk_sizes(n_steps: int, chunk: int):
    """Chunk schedule covering exactly ``n_steps`` SGD steps: full chunks
    plus one exactly-sized remainder (its different scan length costs one
    extra compile, only when n_steps % chunk != 0)."""
    full, rem = divmod(n_steps, chunk)
    return [chunk] * full + ([rem] if rem else [])


def _transitions(episodes: Sequence[dict]) -> Tuple[np.ndarray, ...]:
    obs, act, nxt = [], [], []
    for ep in episodes:
        o = np.asarray(ep["observations"], np.float32)
        a = np.asarray(ep["actions"], np.float32)
        T = min(len(a), len(o) - 1)
        obs.append(o[:T])
        act.append(a[:T])
        nxt.append(o[1 : T + 1])
    return np.concatenate(obs), np.concatenate(act), np.concatenate(nxt)


def train_dynamics_model(
    episodes: Sequence[dict],
    *,
    hidden: Tuple[int, ...] = (256, 256),
    n_steps: int = 2000,
    batch_size: int = 1024,
    lr: float = 1e-3,
    val_fraction: float = 0.1,
    seed: int = 0,
    verbose: bool = False,
):
    """Fit a DynamicsMLP to episode transitions.

    Returns (model, params, ModelStats, metrics) where metrics includes the
    held-out one-step R^2 per observation dimension (min and mean).
    """
    import optax

    obs, act, nxt = _transitions(episodes)
    delta = nxt - obs
    n = len(obs)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_fraction))
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    def stats_of(x):
        return x.mean(0), x.std(0) + 1e-6

    om, os_ = stats_of(obs[train_idx])
    am, as_ = stats_of(act[train_idx])
    dm, ds = stats_of(delta[train_idx])
    stats = ModelStats(*(jnp.asarray(v) for v in (om, os_, am, as_, dm, ds)))

    obs_n = (obs - om) / os_
    act_n = (act - am) / as_
    delta_n = (delta - dm) / ds

    model = DynamicsMLP(obs_dim=obs.shape[-1], hidden=hidden)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, obs.shape[-1])),
        jnp.zeros((1, act.shape[-1])),
    )["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    tr_obs = jnp.asarray(obs_n[train_idx])
    tr_act = jnp.asarray(act_n[train_idx])
    tr_delta = jnp.asarray(delta_n[train_idx])
    n_train = len(train_idx)

    # One dispatch per CHUNK of SGD steps (lax.scan), not per step: on a
    # tunneled TPU the per-call RPC (~25-30 ms) would otherwise dominate
    # (12k steps -> minutes of pure round trips).
    chunk = max(1, min(500, n_steps))

    @jax.jit
    def run_chunk(params, opt_state, keys):
        def body(carry, k):
            p, s = carry
            idx = jax.random.randint(k, (batch_size,), 0, n_train)

            def loss_fn(p_):
                pred = model.apply(
                    {"params": p_}, tr_obs[idx], tr_act[idx]
                )
                return jnp.mean((pred - tr_delta[idx]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(grads, s)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, losses[-50:].mean()

    key = jax.random.PRNGKey(seed + 1)
    done_steps = 0
    for size in _chunk_sizes(n_steps, chunk):
        key, sub = jax.random.split(key)
        params, opt_state, loss = run_chunk(
            params, opt_state, jax.random.split(sub, size)
        )
        done_steps += size
        if verbose:
            print(
                f"dynamics step {done_steps}: loss={float(loss):.5f}",
                flush=True,
            )

    # held-out one-step R^2 in physical delta space
    pred_n = model.apply(
        {"params": params}, jnp.asarray(obs_n[val_idx]), jnp.asarray(act_n[val_idx])
    )
    pred = np.asarray(pred_n) * ds + dm
    true = delta[val_idx]
    ss_res = ((true - pred) ** 2).sum(0)
    ss_tot = ((true - true.mean(0)) ** 2).sum(0) + 1e-12
    r2 = 1.0 - ss_res / ss_tot
    metrics = {"r2_min": float(r2.min()), "r2_mean": float(r2.mean())}
    return model, params, stats, metrics


def train_dynamics_ensemble(
    episodes: Sequence[dict],
    *,
    n_models: int = 4,
    hidden: Tuple[int, ...] = (256, 256),
    n_steps: int = 2000,
    batch_size: int = 1024,
    lr: float = 1e-3,
    val_fraction: float = 0.1,
    seed: int = 0,
    verbose: bool = False,
):
    """Fit an ensemble of DynamicsMLPs (different inits + minibatch streams).

    All members train simultaneously under one ``jax.vmap`` — on TPU an
    E-way ensemble costs ~the same wall-clock as one model (the MXU is
    nowhere near saturated by a (256,256) MLP at batch 1024).

    Returns (model, stacked_params, ModelStats, metrics): ``stacked_params``
    has a leading ensemble axis on every leaf; metrics include per-member
    and ensemble-mean held-out one-step R^2.
    """
    import optax

    obs, act, nxt = _transitions(episodes)
    delta = nxt - obs
    n = len(obs)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_fraction))
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    def stats_of(x):
        return x.mean(0), x.std(0) + 1e-6

    om, os_ = stats_of(obs[train_idx])
    am, as_ = stats_of(act[train_idx])
    dm, ds = stats_of(delta[train_idx])
    stats = ModelStats(*(jnp.asarray(v) for v in (om, os_, am, as_, dm, ds)))

    obs_n = (obs - om) / os_
    act_n = (act - am) / as_
    delta_n = (delta - dm) / ds

    model = DynamicsMLP(obs_dim=obs.shape[-1], hidden=hidden)

    def init_one(key):
        return model.init(
            key, jnp.zeros((1, obs.shape[-1])), jnp.zeros((1, act.shape[-1]))
        )["params"]

    stacked = jax.vmap(init_one)(
        jax.random.split(jax.random.PRNGKey(seed), n_models)
    )
    opt = optax.adam(lr)
    opt_states = jax.vmap(opt.init)(stacked)

    tr_obs = jnp.asarray(obs_n[train_idx])
    tr_act = jnp.asarray(act_n[train_idx])
    tr_delta = jnp.asarray(delta_n[train_idx])
    n_train = len(train_idx)
    chunk = max(1, min(500, n_steps))

    def one_step(p, s, key):
        idx = jax.random.randint(key, (batch_size,), 0, n_train)

        def loss_fn(p_):
            pred = model.apply({"params": p_}, tr_obs[idx], tr_act[idx])
            return jnp.mean((pred - tr_delta[idx]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def run_chunk(stacked, opt_states, keys):
        def body(carry, k):
            ps, ss = carry
            keys_e = jax.random.split(k, n_models)
            ps, ss, losses = jax.vmap(one_step)(ps, ss, keys_e)
            return (ps, ss), losses

        (stacked, opt_states), losses = jax.lax.scan(
            body, (stacked, opt_states), keys
        )
        return stacked, opt_states, losses[-50:].mean()

    key = jax.random.PRNGKey(seed + 1)
    done_steps = 0
    for size in _chunk_sizes(n_steps, chunk):
        key, sub = jax.random.split(key)
        stacked, opt_states, loss = run_chunk(
            stacked, opt_states, jax.random.split(sub, size)
        )
        done_steps += size
        if verbose:
            print(
                f"ensemble step {done_steps}: loss={float(loss):.5f}",
                flush=True,
            )

    # held-out one-step R^2, per member and for the ensemble mean
    vo = jnp.asarray(obs_n[val_idx])
    va = jnp.asarray(act_n[val_idx])
    preds_n = jax.vmap(
        lambda p: model.apply({"params": p}, vo, va)
    )(stacked)  # (E, n_val, d)
    preds = np.asarray(preds_n) * ds + dm
    true = delta[val_idx]
    ss_tot = ((true - true.mean(0)) ** 2).sum(0) + 1e-12

    def r2_of(pred):
        return 1.0 - ((true - pred) ** 2).sum(0) / ss_tot

    member_r2 = [float(r2_of(preds[e]).mean()) for e in range(n_models)]
    mean_r2 = r2_of(preds.mean(0))
    metrics = {
        "r2_mean": float(mean_r2.mean()),
        "r2_min": float(mean_r2.min()),
        "member_r2": member_r2,
    }
    return model, stacked, stats, metrics


def make_ensemble_step_fn(model, stacked_params, stats, n_samples: int):
    """Trajectory-sampling (PETS TS-inf) step function for the MPPI planner.

    The planner evaluates ``n_samples`` candidate sequences with leading
    axis N on ``(N, B, d)`` states; this step function assigns each
    candidate to one ensemble member (contiguous blocks: candidates
    ``[e*N/E, (e+1)*N/E)`` -> member ``e``) for its WHOLE rollout. Candidates that only look good under one member's
    idiosyncratic errors score badly under the members evaluating their
    neighbors, so the MPPI weighting suppresses model exploitation.

    ``n_samples`` must be divisible by the ensemble size.
    """
    n_models = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_samples % n_models:
        raise ValueError(
            f"n_samples ({n_samples}) must be divisible by ensemble size "
            f"({n_models})"
        )

    def step_fn(obs, act):
        # obs/act: (N, B, dim) -> (E, N/E, B, dim)
        N = obs.shape[0]
        grp = lambda x: x.reshape((n_models, N // n_models) + x.shape[1:])
        o_n = grp((obs - stats.obs_mean) / stats.obs_std)
        a_n = grp((act - stats.act_mean) / stats.act_std)
        d_n = jax.vmap(
            lambda p, o, a: model.apply({"params": p}, o, a)
        )(stacked_params, o_n, a_n)
        d_n = d_n.reshape((N,) + obs.shape[1:])
        return obs + d_n * stats.delta_std + stats.delta_mean

    return step_fn


class InverseDynamicsMLP(nn.Module):
    """(obs_t, obs_{t+1}) -> action, all normalized (Decision-Diffuser-style
    action extraction: plans carry good STATE sequences; deriving the action
    per executed step from consecutive planned states is far more robust
    than executing the plan's smoothed action columns open-loop)."""

    act_dim: int
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs: jax.Array, next_obs: jax.Array) -> jax.Array:
        x = jnp.concatenate([obs, next_obs], axis=-1)
        for h in self.hidden:
            x = nn.swish(nn.Dense(h)(x))
        return nn.Dense(self.act_dim)(x)


def train_inverse_dynamics(
    episodes: Sequence[dict],
    *,
    hidden: Tuple[int, ...] = (256, 256),
    n_steps: int = 2000,
    batch_size: int = 1024,
    lr: float = 1e-3,
    val_fraction: float = 0.1,
    seed: int = 0,
    verbose: bool = False,
):
    """Fit an InverseDynamicsMLP to episode transitions.

    Returns (predict_fn, metrics): ``predict_fn(obs_phys, next_obs_phys) ->
    action_phys`` (batched, jitted) and held-out action R^2.
    """
    import optax

    obs, act, nxt = _transitions(episodes)
    n = len(obs)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_fraction))
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    om, os_ = obs[train_idx].mean(0), obs[train_idx].std(0) + 1e-6
    am, as_ = act[train_idx].mean(0), act[train_idx].std(0) + 1e-6

    obs_n = (obs - om) / os_
    nxt_n = (nxt - om) / os_
    act_n = (act - am) / as_

    model = InverseDynamicsMLP(act_dim=act.shape[-1], hidden=hidden)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, obs.shape[-1])),
        jnp.zeros((1, obs.shape[-1])),
    )["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    tr_o = jnp.asarray(obs_n[train_idx])
    tr_n = jnp.asarray(nxt_n[train_idx])
    tr_a = jnp.asarray(act_n[train_idx])
    n_train = len(train_idx)
    # chunked lax.scan like the forward-dynamics trainers above: one
    # dispatch per chunk, not per SGD step (the per-call tunnel RPC would
    # otherwise dominate this live-eval-path fit)
    chunk = max(1, min(500, n_steps))

    @jax.jit
    def run_chunk(params, opt_state, keys):
        def body(carry, k):
            p, s = carry
            idx = jax.random.randint(k, (batch_size,), 0, n_train)

            def loss_fn(p_):
                pred = model.apply({"params": p_}, tr_o[idx], tr_n[idx])
                return jnp.mean((pred - tr_a[idx]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(grads, s)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, losses[-50:].mean()

    key = jax.random.PRNGKey(seed + 1)
    done_steps = 0
    for size in _chunk_sizes(n_steps, chunk):
        key, sub = jax.random.split(key)
        params, opt_state, loss = run_chunk(
            params, opt_state, jax.random.split(sub, size)
        )
        done_steps += size
        if verbose:
            print(f"invdyn step {done_steps}: loss={float(loss):.5f}", flush=True)

    pred_n = model.apply(
        {"params": params}, jnp.asarray(obs_n[val_idx]), jnp.asarray(nxt_n[val_idx])
    )
    pred = np.asarray(pred_n) * as_ + am
    true = act[val_idx]
    ss_res = ((true - pred) ** 2).sum(0)
    ss_tot = ((true - true.mean(0)) ** 2).sum(0) + 1e-12
    r2 = 1.0 - ss_res / ss_tot
    metrics = {"r2_min": float(r2.min()), "r2_mean": float(r2.mean())}

    om_j, os_j = jnp.asarray(om), jnp.asarray(os_)
    am_j, as_j = jnp.asarray(am), jnp.asarray(as_)

    @jax.jit
    def predict_fn(obs_phys, next_obs_phys):
        o = (jnp.asarray(obs_phys) - om_j) / os_j
        nx = (jnp.asarray(next_obs_phys) - om_j) / os_j
        return model.apply({"params": params}, o, nx) * as_j + am_j

    return predict_fn, metrics


# --- on-device reward/termination models (doc'd gymnasium v5 semantics) ---

def halfcheetah_reward_done(obs, next_obs, action):
    x_vel = next_obs[..., 8]
    reward = x_vel - 0.1 * jnp.sum(action**2, axis=-1)
    return reward, jnp.zeros_like(x_vel, bool)


def hopper_reward_done(obs, next_obs, action):
    x_vel = next_obs[..., 5]
    z, angle = next_obs[..., 0], next_obs[..., 1]
    # gymnasium Hopper-v5 is_healthy: z and angle ranges AND every remaining
    # state element within healthy_state_range (-100, 100) — without the
    # state-range term, learned-sim rollouts with exploding velocities score
    # as huge reward instead of terminating, and MPPI selects the blow-up.
    state_ok = jnp.all(jnp.abs(next_obs[..., 2:]) < 100.0, axis=-1)
    healthy = (z > 0.7) & (jnp.abs(angle) < 0.2) & state_ok
    reward = x_vel + 1.0 * healthy - 1e-3 * jnp.sum(action**2, axis=-1)
    return reward, ~healthy


def walker2d_reward_done(obs, next_obs, action):
    x_vel = next_obs[..., 8]
    z, angle = next_obs[..., 0], next_obs[..., 1]
    healthy = (z > 0.8) & (z < 2.0) & (jnp.abs(angle) < 1.0)
    reward = x_vel + 1.0 * healthy - 1e-3 * jnp.sum(action**2, axis=-1)
    return reward, ~healthy


REWARD_MODELS: Dict[str, Callable] = {
    "halfcheetah": halfcheetah_reward_done,
    "hopper": hopper_reward_done,
    "walker": walker2d_reward_done,
}


def reward_model_for(env_name: str) -> Callable:
    key = env_name.lower()
    for name, fn in REWARD_MODELS.items():
        if name in key:
            return fn
    raise ValueError(f"No on-device reward model for {env_name}")


def make_ondevice_locomotion_evaluator(
    diffusion,
    model: DynamicsMLP,
    model_params,
    model_stats: ModelStats,
    reward_done: Callable,
    *,
    action_horizon: int = 8,
    n_replans: int = 25,
    sampling_timesteps: Optional[int] = None,
    sampler: str = "ddpm",
    jit: bool = True,
    mesh=None,
    batch_axis: str = "dp",
    ensemble: bool = False,
):
    """On-device plan->step->replan over the learned simulator.

    With ``ensemble=True``, ``model_params`` is ensemble-stacked (leading
    member axis on every leaf, as returned by ``train_dynamics_ensemble``)
    and the simulator steps the deterministic ensemble MEAN — the surrogate
    whose K-step return error the measured bound
    (scripts/surrogate_bound.py) actually characterizes.

    Returns ``evaluate(params, rng, norm_stats, init_obs) -> (mean_return,
    mean_length, returns)``: two nested lax.scans (replans x action steps)
    with the DynamicsMLP as the env, zero host syncs. ``init_obs`` is a
    (B, obs_dim) batch of real reset observations (host reset keeps the
    initial-state distribution honest). Done-envs freeze (reward masked).

    The returns are *model-based* (surrogate) — the learned simulator drifts
    over long horizons; scripts/evaluate.py on the host env is ground truth.
    """
    from dadiff_tpu.guides.sampling import conditions_for_initial_obs, make_sampler

    plan = make_sampler(
        diffusion, sampling_timesteps=sampling_timesteps, sampler=sampler,
        jit=False,
    )
    obs_dim = diffusion.observation_dim
    act_dim = diffusion.action_dim
    horizon = diffusion.horizon
    trans_dim = diffusion.transition_dim
    if action_horizon > horizon:
        raise ValueError("action_horizon must be <= planning horizon")

    batch_shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_shard = NamedSharding(mesh, PartitionSpec(batch_axis))

    def model_step(obs, act):
        o_n = (obs - model_stats.obs_mean) / model_stats.obs_std
        a_n = (act - model_stats.act_mean) / model_stats.act_std
        if ensemble:
            d_n = jnp.mean(
                jax.vmap(
                    lambda p: model.apply({"params": p}, o_n, a_n)
                )(model_params),
                axis=0,
            )
        else:
            d_n = model.apply({"params": model_params}, o_n, a_n)
        return obs + d_n * model_stats.delta_std + model_stats.delta_mean

    def evaluate(params, rng, norm_stats, init_obs):
        obs = jnp.asarray(init_obs)
        if batch_shard is not None:
            obs = jax.lax.with_sharding_constraint(obs, batch_shard)
        batch = obs.shape[0]
        total = jnp.zeros((batch,))
        alive = jnp.ones((batch,), bool)
        length = jnp.zeros((batch,))

        def macro(carry, key):
            obs, total, alive, length = carry
            normed = (obs - norm_stats.obs_mean) / norm_stats.obs_std
            cond = conditions_for_initial_obs(normed, obs_dim, horizon, trans_dim)
            traj = plan(params, key, cond)
            acts_n = traj[:, :action_horizon, obs_dim : obs_dim + act_dim]
            acts = acts_n * norm_stats.action_std + norm_stats.action_mean

            def env_step(inner, a):
                obs, total, alive, length = inner
                nxt = model_step(obs, a)
                reward, done = reward_done(obs, nxt, a)
                total = total + reward * alive
                length = length + alive
                alive = alive & ~done
                # frozen envs keep their last obs (masked step)
                obs = jnp.where(alive[:, None], nxt, obs)
                return (obs, total, alive, length), None

            (obs, total, alive, length), _ = jax.lax.scan(
                env_step, (obs, total, alive, length), jnp.swapaxes(acts, 0, 1)
            )
            return (obs, total, alive, length), None

        keys = jax.random.split(rng, n_replans)
        (obs, total, alive, length), _ = jax.lax.scan(
            macro, (obs, total, alive, length), keys
        )
        return jnp.mean(total), jnp.mean(length), total

    if jit:
        return jax.jit(evaluate)
    return evaluate
