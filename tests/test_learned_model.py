"""Learned-simulator locomotion path: dynamics MLP fit, reward-model parity
with the real gymnasium envs, and the on-device plan->step->replan loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.envs.learned_model import (
    DynamicsMLP,
    halfcheetah_reward_done,
    hopper_reward_done,
    make_ondevice_locomotion_evaluator,
    reward_model_for,
    train_dynamics_model,
    walker2d_reward_done,
)


def _linear_episodes(n=6, T=50, obs_dim=4, act_dim=2, seed=0):
    """Ground-truth linear dynamics -> a learnable transition set."""
    rs = np.random.RandomState(seed)
    A = np.eye(obs_dim) + 0.05 * rs.randn(obs_dim, obs_dim)
    B = 0.3 * rs.randn(obs_dim, act_dim)
    eps = []
    for _ in range(n):
        o = rs.randn(obs_dim)
        obs, acts = [o], []
        for _ in range(T):
            a = rs.uniform(-1, 1, act_dim)
            o = A @ o + B @ a
            obs.append(o)
            acts.append(a)
        eps.append({
            "observations": np.asarray(obs, np.float32),
            "actions": np.asarray(acts, np.float32),
        })
    return eps


def test_dynamics_model_fits_linear_system():
    eps = _linear_episodes()
    model, params, stats, metrics = train_dynamics_model(
        eps, hidden=(64, 64), n_steps=1500, batch_size=256, seed=0
    )
    assert metrics["r2_mean"] > 0.95, metrics
    # one-step prediction in physical space over a bulk of transitions:
    # median error well under the typical step size
    obs = jnp.asarray(eps[0]["observations"][:-1])
    acts = jnp.asarray(eps[0]["actions"])
    o_n = (obs - stats.obs_mean) / stats.obs_std
    a_n = (acts - stats.act_mean) / stats.act_std
    pred = obs + model.apply({"params": params}, o_n, a_n) * stats.delta_std \
        + stats.delta_mean
    true = jnp.asarray(eps[0]["observations"][1:])
    err = jnp.linalg.norm(pred - true, axis=-1)
    step_size = jnp.linalg.norm(true - obs, axis=-1)
    assert float(jnp.median(err)) < 0.3 * float(jnp.median(step_size))


@pytest.mark.parametrize("env_name,reward_done", [
    ("HalfCheetah-v5", halfcheetah_reward_done),
    ("Hopper-v5", hopper_reward_done),
    ("Walker2d-v5", walker2d_reward_done),
])
def test_reward_model_matches_real_env(env_name, reward_done):
    """The on-device reward computed from observations tracks the env's
    actual reward (same x_vel component + control cost + healthy bonus)."""
    gym = pytest.importorskip("gymnasium")
    env = gym.make(env_name)
    obs, _ = env.reset(seed=0)
    rs = np.random.RandomState(0)
    for _ in range(10):
        a = rs.uniform(-1, 1, env.action_space.shape[0]).astype(np.float32)
        nxt, r, term, trunc, info = env.step(a)
        model_r, model_done = reward_done(
            jnp.asarray(obs)[None], jnp.asarray(nxt)[None], jnp.asarray(a)[None]
        )
        # x_velocity in info is exact; obs-derived qvel is the same quantity
        assert abs(float(model_r[0]) - float(r)) < 0.7, (
            env_name, float(model_r[0]), float(r))
        if term:
            assert bool(model_done[0])
            break
        obs = nxt
    env.close()


def test_reward_model_registry():
    assert reward_model_for("HalfCheetah-v5") is halfcheetah_reward_done
    assert reward_model_for("Hopper-v5") is hopper_reward_done
    with pytest.raises(ValueError):
        reward_model_for("PointMaze_UMaze-v3")


def test_ondevice_locomotion_evaluator_runs():
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.ops.projection import NormStats

    obs_dim, act_dim = 4, 2
    eps = _linear_episodes(obs_dim=obs_dim, act_dim=act_dim)
    model, mparams, mstats, _ = train_dynamics_model(
        eps, hidden=(32,), n_steps=100, batch_size=128
    )

    unet = TemporalUnet(transition_dim=obs_dim + act_dim, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(model=unet, horizon=8, observation_dim=obs_dim,
                          action_dim=act_dim, n_timesteps=5)
    params = d.init_params(jax.random.PRNGKey(0))

    def fake_reward(obs, nxt, act):
        return nxt[..., 0], jnp.zeros(nxt.shape[:-1], bool)

    ev = make_ondevice_locomotion_evaluator(
        d, model, mparams, mstats, fake_reward,
        action_horizon=4, n_replans=3,
    )
    init_obs = jnp.asarray(np.stack([e["observations"][0] for e in eps[:4]]))
    stats = NormStats.identity(obs_dim, act_dim)
    mean_ret, mean_len, returns = ev(params, jax.random.PRNGKey(1), stats, init_obs)
    assert returns.shape == (4,)
    assert np.isfinite(float(mean_ret))
    assert float(mean_len) == 12.0  # 3 replans x 4 actions, nothing dies


def test_ondevice_locomotion_evaluator_ensemble_mean():
    """ensemble=True steps the ensemble MEAN: equals averaging member
    predictions (the surrogate scripts/surrogate_bound.py bounds)."""
    from dadiff_tpu.envs.learned_model import train_dynamics_ensemble
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.ops.projection import NormStats

    obs_dim, act_dim = 4, 2
    eps = _linear_episodes(obs_dim=obs_dim, act_dim=act_dim)
    model, stacked, mstats, metrics = train_dynamics_ensemble(
        eps, n_models=3, hidden=(32,), n_steps=100, batch_size=128
    )
    assert len(metrics["member_r2"]) == 3

    unet = TemporalUnet(transition_dim=obs_dim + act_dim, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(model=unet, horizon=8, observation_dim=obs_dim,
                          action_dim=act_dim, n_timesteps=5)
    params = d.init_params(jax.random.PRNGKey(0))

    def fake_reward(obs, nxt, act):
        return nxt[..., 0], jnp.zeros(nxt.shape[:-1], bool)

    ev = make_ondevice_locomotion_evaluator(
        d, model, stacked, mstats, fake_reward,
        action_horizon=4, n_replans=2, ensemble=True,
    )
    init_obs = jnp.asarray(np.stack([e["observations"][0] for e in eps[:4]]))
    stats = NormStats.identity(obs_dim, act_dim)
    mean_ret, mean_len, returns = ev(params, jax.random.PRNGKey(1), stats, init_obs)
    assert returns.shape == (4,)
    assert np.isfinite(float(mean_ret))
    assert float(mean_len) == 8.0

def test_surrogate_bound_segments_per_k():
    """segments_from_episodes windows per K and reports excluded episodes
    (ADVICE r3: max-K windowing silently dropped short episodes)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "surrogate_bound",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "surrogate_bound.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)

    def ep(n):
        return {
            "observations": rng.randn(n + 1, 3).astype(np.float32),
            "actions": rng.randn(n, 2).astype(np.float32),
            "rewards": rng.randn(n).astype(np.float32),
        }

    episodes = [ep(10), ep(100)]
    # K=4: both episodes contribute
    seg, excluded = mod.segments_from_episodes(episodes, 4, 10, 2)
    assert excluded == 0 and seg is not None
    # K=64: the 10-step episode is excluded and counted
    seg, excluded = mod.segments_from_episodes(episodes, 64, 10, 2)
    assert excluded == 1 and seg is not None
    assert seg[1].shape[1] == 64
    # nothing usable
    seg, excluded = mod.segments_from_episodes([ep(5)], 64, 10, 2)
    assert seg is None and excluded == 1


def test_ondevice_locomotion_done_freezes_env():
    """A done env stops accumulating reward and length."""
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.ops.projection import NormStats

    obs_dim, act_dim = 4, 2
    eps = _linear_episodes(obs_dim=obs_dim, act_dim=act_dim)
    model, mparams, mstats, _ = train_dynamics_model(
        eps, hidden=(16,), n_steps=50, batch_size=64
    )
    unet = TemporalUnet(transition_dim=obs_dim + act_dim, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(model=unet, horizon=8, observation_dim=obs_dim,
                          action_dim=act_dim, n_timesteps=5)
    params = d.init_params(jax.random.PRNGKey(0))

    def die_immediately(obs, nxt, act):
        return jnp.ones(nxt.shape[:-1]), jnp.ones(nxt.shape[:-1], bool)

    ev = make_ondevice_locomotion_evaluator(
        d, model, mparams, mstats, die_immediately,
        action_horizon=4, n_replans=3,
    )
    init_obs = jnp.zeros((2, obs_dim))
    stats = NormStats.identity(obs_dim, act_dim)
    mean_ret, mean_len, returns = ev(params, jax.random.PRNGKey(1), stats, init_obs)
    # exactly one rewarded step before the env froze
    assert float(mean_ret) == 1.0
    assert float(mean_len) == 1.0


def test_inverse_dynamics_recovers_actions():
    """On a linear system a = B^+ (x' - A x); the MLP should recover the
    actions that generated held-out transitions."""
    from dadiff_tpu.envs.learned_model import train_inverse_dynamics

    eps = _linear_episodes(n=8, T=60, obs_dim=4, act_dim=2, seed=3)
    predict_fn, metrics = train_inverse_dynamics(
        eps, hidden=(64, 64), n_steps=1500, batch_size=256, seed=0
    )
    assert metrics["r2_mean"] > 0.9, metrics
    obs = eps[0]["observations"]
    acts = eps[0]["actions"]
    pred = np.asarray(predict_fn(obs[10:20], obs[11:21]))
    err = np.abs(pred - acts[10:20])
    assert float(np.median(err)) < 0.15, float(np.median(err))


def test_policy_inverse_dynamics_action_extraction():
    """GuidedPolicy with inverse_dynamics derives actions from planned
    states (count and shape match the action horizon)."""
    from dadiff_tpu.guides.policies import MPCPolicy
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.datasets.normalization import DatasetNormalizer

    obs_dim, act_dim = 4, 2
    rs = np.random.RandomState(0)
    obs = rs.randn(100, obs_dim).astype(np.float32)
    acts = rs.randn(100, act_dim).astype(np.float32)
    normalizer = DatasetNormalizer(obs, acts, obs_dim, act_dim)

    unet = TemporalUnet(transition_dim=6, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(model=unet, horizon=8, observation_dim=obs_dim,
                          action_dim=act_dim, n_timesteps=5)
    params = d.init_params(jax.random.PRNGKey(0))

    calls = {}

    def fake_inverse(o, nxt):
        calls["shapes"] = (np.asarray(o).shape, np.asarray(nxt).shape)
        return jnp.ones((np.asarray(o).shape[0], act_dim)) * 7.0

    pol = MPCPolicy(d, normalizer, params=params, action_horizon=3,
                    skip_conditioned_action=True,
                    inverse_dynamics=fake_inverse)
    a = pol.get_action(np.zeros(obs_dim, np.float32))
    assert a.shape == (act_dim,)
    np.testing.assert_allclose(a, 7.0)
    # 3 actions buffered+popped: rows start..start+3 -> 4 obs rows, 3 pairs
    assert calls["shapes"][0][0] == 3
    assert len(pol.action_buffer) == 2


def test_policy_closed_loop_state_tracking():
    """action_source=track: each action is computed at EXECUTION time from
    the observed state toward the planned next state — when the observed
    state drifts, the tracked action changes with it (the open-loop variant
    by construction cannot)."""
    from dadiff_tpu.guides.policies import MPCPolicy
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.datasets.normalization import DatasetNormalizer

    obs_dim, act_dim = 4, 2
    rs = np.random.RandomState(0)
    obs = rs.randn(100, obs_dim).astype(np.float32)
    acts = rs.randn(100, act_dim).astype(np.float32)
    normalizer = DatasetNormalizer(obs, acts, obs_dim, act_dim)

    unet = TemporalUnet(transition_dim=6, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(model=unet, horizon=8, observation_dim=obs_dim,
                          action_dim=act_dim, n_timesteps=5)
    params = d.init_params(jax.random.PRNGKey(0))

    seen = []

    def linear_inverse(o, nxt):
        # exact invdyn of x' = x + u_pad: u = (x' - x)[:, :act_dim]
        seen.append(np.asarray(o).copy())
        return jnp.asarray(nxt)[:, :act_dim] - jnp.asarray(o)[:, :act_dim]

    pol = MPCPolicy(d, normalizer, params=params, action_horizon=3,
                    skip_conditioned_action=True,
                    inverse_dynamics=linear_inverse,
                    track_planned_states=True)
    o0 = np.zeros(obs_dim, np.float32)
    a0 = pol.get_action(o0)
    assert a0.shape == (act_dim,)
    # buffer holds planned STATES (obs_dim rows), not actions
    assert len(pol.action_buffer) == 2
    assert pol.action_buffer[0].shape == (obs_dim,)
    target1 = pol.action_buffer[0].copy()

    # two different observed states -> two different tracked actions toward
    # the SAME planned target (pure closed-loop dependence on s_obs)
    o_a = np.full(obs_dim, 0.5, np.float32)
    a_from_a = pol.get_action(o_a)
    pol.action_buffer.insert(0, target1)  # rewind the buffer
    pol._planned_obs.insert(0, pol._planned_obs[0] if pol._planned_obs else target1)
    o_b = np.full(obs_dim, -0.5, np.float32)
    a_from_b = pol.get_action(o_b)
    assert not np.allclose(a_from_a, a_from_b)
    np.testing.assert_allclose(
        a_from_a - a_from_b,
        (o_b - o_a)[:act_dim],
        rtol=1e-5, atol=1e-5,
    )
    # the invdyn call saw the OBSERVED states, not plan rows
    assert np.allclose(seen[-1][0], o_b)
