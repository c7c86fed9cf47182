"""Receding-horizon warm-start replanning (guides/sampling.py
``make_sampler(warm_start_from=K)`` + policy/vector_eval integration) —
new capability vs the reference (always samples from pure noise,
policies.py:114-149)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.guides.policies import MPCPolicy
from dadiff_tpu.guides.sampling import (
    conditions_for_initial_obs,
    make_sampler,
)
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.fixture(scope="module")
def diffusion():
    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    return GaussianDiffusion(
        model=unet, horizon=16, observation_dim=6, action_dim=2, n_timesteps=20
    )


@pytest.fixture(scope="module")
def params(diffusion):
    return diffusion.init_params(jax.random.PRNGKey(0))


def _conditions(diffusion, batch=1):
    return conditions_for_initial_obs(
        jnp.zeros((batch, diffusion.observation_dim)),
        diffusion.observation_dim,
        diffusion.horizon,
        diffusion.transition_dim,
    )


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "dpmpp"])
def test_warm_sampler_shapes(diffusion, params, sampler):
    plan = make_sampler(diffusion, sampler=sampler, warm_start_from=8)
    cond = _conditions(diffusion, batch=2)
    x_init = jnp.zeros((2, diffusion.horizon, diffusion.transition_dim))
    traj = plan(params, jax.random.PRNGKey(1), cond, x_init=x_init)
    assert traj.shape == (2, diffusion.horizon, diffusion.transition_dim)
    assert bool(jnp.all(jnp.isfinite(traj)))


def test_warm_start_anchors_to_init(diffusion, params):
    """A shallow warm chain (K=2) must stay far closer to x_init than a
    fresh full-chain sample does: q_sample at small t barely perturbs."""
    cond = _conditions(diffusion)
    x_init = jnp.clip(
        jax.random.normal(
            jax.random.PRNGKey(7), (1, diffusion.horizon, diffusion.transition_dim)
        ),
        -1,
        1,
    )
    warm = make_sampler(diffusion, warm_start_from=2)
    full = make_sampler(diffusion)
    out_warm = warm(params, jax.random.PRNGKey(2), cond, x_init=x_init)
    out_full = full(params, jax.random.PRNGKey(2), cond)
    d_warm = float(jnp.linalg.norm(out_warm - x_init))
    d_full = float(jnp.linalg.norm(out_full - x_init))
    assert d_warm < 0.5 * d_full, (d_warm, d_full)


def test_warm_start_validation(diffusion, params):
    with pytest.raises(ValueError, match="warm_start_from"):
        make_sampler(diffusion, warm_start_from=0)
    with pytest.raises(ValueError, match="warm_start_from"):
        make_sampler(diffusion, warm_start_from=diffusion.n_timesteps + 1)
    # every standard grid includes t=0, so K=1 still leaves one step
    plan = make_sampler(
        diffusion, sampler="ddim", sampling_timesteps=2, warm_start_from=1
    )
    assert np.asarray(plan.timesteps).tolist() == [0]
    plan = make_sampler(diffusion, warm_start_from=4)
    with pytest.raises(ValueError, match="x_init"):
        plan(params, jax.random.PRNGKey(0), _conditions(diffusion))


def test_warm_chain_is_shorter(diffusion):
    """warm_start_from=K restricts the reverse chain to exactly t = K-1..0
    (one model call per entry)."""
    plan = make_sampler(diffusion, warm_start_from=5)
    assert np.asarray(plan.timesteps).tolist() == [4, 3, 2, 1, 0]
    # composes with truncation: last S steps, then the warm cut
    plan = make_sampler(diffusion, sampling_timesteps=10, warm_start_from=5)
    assert np.asarray(plan.timesteps).tolist() == [4, 3, 2, 1, 0]
    # and with the strided DDIM grid
    plan = make_sampler(diffusion, sampler="ddim", sampling_timesteps=10,
                        warm_start_from=10)
    ts = np.asarray(plan.timesteps)
    assert ts.max() < 10 and (np.diff(ts) < 0).all() and ts[-1] == 0


class _IdentityNormalizer:
    obs_mean = np.zeros(6, np.float32)
    obs_std = np.ones(6, np.float32)
    action_mean = np.zeros(2, np.float32)
    action_std = np.ones(2, np.float32)

    def normalize_observations(self, x):
        return np.asarray(x, np.float32)

    def unnormalize_observations(self, x):
        return np.asarray(x, np.float32)

    def unnormalize_actions(self, x):
        return np.asarray(x, np.float32)


def test_policy_warm_replan_cycle(diffusion, params):
    policy = MPCPolicy(
        diffusion,
        _IdentityNormalizer(),
        params=params,
        action_horizon=3,
        warm_start_t=4,
        skip_conditioned_action=True,
    )
    obs = np.zeros(6, np.float32)
    # first replan: full chain, plan cached
    a = policy.get_action(obs)
    assert a.shape == (2,)
    assert policy._last_plan is not None and policy._actions_taken == 1
    # drain the buffer (3 actions buffered with skip_conditioned_action)
    policy.get_action(obs)
    policy.get_action(obs)
    assert policy._actions_taken == 3
    # second replan goes through the warm path
    init = policy._warm_init()
    assert init is not None and init.shape == (1, 16, 8)
    # shifted: row 0 of init == row 3 of the cached plan
    np.testing.assert_allclose(init[0, 0], policy._last_plan[0, 3])
    # tail padded with the final row
    np.testing.assert_allclose(init[0, -1], policy._last_plan[0, -1])
    a = policy.get_action(obs)
    assert a.shape == (2,) and policy._actions_taken == 1
    # reset clears warm state
    policy.reset()
    assert policy._last_plan is None and policy._warm_init() is None


def test_policy_warm_with_candidates(diffusion, params):
    policy = MPCPolicy(
        diffusion,
        _IdentityNormalizer(),
        params=params,
        action_horizon=2,
        warm_start_t=4,
        n_candidates=4,
    )
    obs = np.zeros(6, np.float32)
    for _ in range(6):  # crosses at least one warm replan
        a = policy.get_action(obs)
        assert np.all(np.isfinite(a))


def test_stale_plan_falls_back_to_full(diffusion, params):
    policy = MPCPolicy(
        diffusion, _IdentityNormalizer(), params=params,
        action_horizon=3, warm_start_t=4,
    )
    policy._last_plan = np.zeros((1, 16, 8), np.float32)
    policy._actions_taken = 16  # >= horizon: nothing of the old plan remains
    assert policy._warm_init() is None


def test_ondevice_rollout_warm_start(diffusion, params):
    from dadiff_tpu.envs.pointmaze_jax import PointMazeJax
    from dadiff_tpu.envs.rollout import make_ondevice_evaluator
    from dadiff_tpu.ops.projection import NormStats

    env = PointMazeJax(map_name="umaze")
    stats = NormStats(
        obs_mean=jnp.zeros(6), obs_std=jnp.ones(6),
        action_mean=jnp.zeros(2), action_std=jnp.ones(2),
    )
    for n_cand in (1, 2):
        evaluator = make_ondevice_evaluator(
            diffusion, env, action_horizon=4, n_replans=3,
            n_candidates=n_cand, warm_start_t=4,
        )
        metrics, _ = evaluator(params, jax.random.PRNGKey(0), stats, 4)
        assert np.isfinite(float(metrics.mean_reward))
        assert 0.0 <= float(metrics.success_rate) <= 1.0


def test_batched_eval_accepts_warm_start(diffusion, params):
    pytest.importorskip("gymnasium_robotics")
    from dadiff_tpu.envs.vector_eval import evaluate_policy_batched

    policy = MPCPolicy(
        diffusion, _IdentityNormalizer(), params=params,
        action_horizon=4, warm_start_t=4,
    )
    # 6-dim obs matches pointmaze obs+goal flattening
    metrics = evaluate_policy_batched(
        policy, "PointMaze_UMaze-v3", n_episodes=2, max_steps=12,
        seed=0, verbose=False,
    )
    assert "success_rate" in metrics


def test_policy_auto_warm_depth(diffusion, params):
    """--warm-start-auto: the re-noise depth tracks the measured drift —
    small drift -> shallow K, huge drift -> full chain (K=None)."""
    policy = MPCPolicy(
        diffusion,
        _IdentityNormalizer(),
        params=params,
        action_horizon=3,
        warm_start_auto=True,
        skip_conditioned_action=True,
    )
    obs = np.zeros(6, np.float32)
    policy.get_action(obs)  # first replan: full chain
    assert policy.last_warm_k is None
    policy.get_action(obs)
    policy.get_action(obs)

    # drift exactly matching the plan row -> smallest depth on the grid
    row = np.asarray(policy._last_plan[0][3, :6], np.float32)
    k_small = policy._auto_warm_k(row.reshape(1, -1))
    assert k_small == 10

    # massive drift -> None (full chain): sqrt(1-acp) can never cover it
    k_full = policy._auto_warm_k((row + 100.0).reshape(1, -1))
    assert k_full is None

    # depth is monotone in drift (T=100 grid so mid levels exist)
    from dadiff_tpu.ops.schedules import make_schedule

    policy._warm_sigmas = np.sqrt(
        1.0 - np.asarray(make_schedule(100, "cosine").alphas_cumprod)
    )
    ks = []
    for delta in (0.02, 0.12, 0.2):
        k = policy._auto_warm_k((row + delta).reshape(1, -1))
        assert k is not None
        ks.append(k)
    assert ks[0] < ks[1] < ks[2]

    # end-to-end: the replan path runs and records the chosen depth
    a = policy.get_action(obs + 0.05)
    assert a.shape == (2,)
    assert policy.last_warm_k is None or policy.last_warm_k >= 10


def test_auto_warm_rejects_fixed_k(diffusion, params):
    with pytest.raises(ValueError, match="either"):
        MPCPolicy(
            diffusion, _IdentityNormalizer(), params=params,
            warm_start_t=4, warm_start_auto=True,
        )


def test_batched_eval_auto_warm_depth(diffusion, params):
    pytest.importorskip("gymnasium_robotics")
    from dadiff_tpu.envs.vector_eval import evaluate_policy_batched

    policy = MPCPolicy(
        diffusion, _IdentityNormalizer(), params=params,
        action_horizon=4, warm_start_auto=True,
    )
    metrics = evaluate_policy_batched(
        policy, "PointMaze_UMaze-v3", n_episodes=2, max_steps=12,
        seed=0, verbose=False,
    )
    assert "success_rate" in metrics
    # at least one wave consulted the drift rule and compiled a warm sampler
    # OR fell back to full chain — either way the run completed; the cache
    # bounds compiles to the grid of 10
    assert all(k % 10 == 0 for k in policy._warm_cache)
