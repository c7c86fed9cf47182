"""TPU-batched MPPI planner (envs/mppi_tpu.py) on an analytical toy model.

Runs on the CPU mesh backend (conftest forces JAX_PLATFORMS=cpu); the
planner is backend-agnostic jitted JAX.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dadiff_tpu.envs.mppi_tpu import make_mppi_planner


def _double_integrator_step(obs, act):
    # obs = (x, v), act scalar in [-1, 1]
    x = obs[..., 0] + 0.1 * obs[..., 1]
    v = obs[..., 1] + 0.1 * act[..., 0]
    return jnp.stack([x, v], axis=-1)


def _reward_done(obs, nxt, act):
    r = -(nxt[..., 0] ** 2) - 0.01 * jnp.sum(act**2, axis=-1)
    return r, jnp.zeros_like(r, bool)


def _rollout(plan, obs0, n_steps, key, horizon, act_dim):
    obs = jnp.asarray(obs0)
    mean = jnp.zeros((obs.shape[0], horizon, act_dim))
    total = jnp.zeros(obs.shape[0])
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        acts, mean = plan(sub, obs, mean)
        act = acts[:, 0]
        nxt = _double_integrator_step(obs, act)
        r, _ = _reward_done(obs, nxt, act)
        total = total + r
        obs = nxt
    return obs, total


def test_mppi_planner_shapes_and_warm_start():
    plan = make_mppi_planner(
        _double_integrator_step, _reward_done,
        act_dim=1, horizon=5, n_samples=16,
    )
    obs = jnp.asarray([[1.0, 0.0], [-2.0, 0.5]])
    mean = jnp.zeros((2, 5, 1))
    act, new_mean = plan(jax.random.PRNGKey(0), obs, mean)
    assert act.shape == (2, 1, 1)  # (B, n_exec, m)
    assert new_mean.shape == (2, 5, 1)
    assert bool(jnp.all(jnp.abs(act) <= 1.0))
    # warm start must actually move (weighted mean of clipped noise != 0)
    assert float(jnp.abs(new_mean).max()) > 0


def test_mppi_planner_n_exec():
    plan = make_mppi_planner(
        _double_integrator_step, _reward_done,
        act_dim=1, horizon=6, n_samples=16, n_exec=3,
    )
    obs = jnp.asarray([[1.0, 0.0]])
    acts, new_mean = plan(jax.random.PRNGKey(0), obs, jnp.zeros((1, 6, 1)))
    assert acts.shape == (1, 3, 1)
    assert new_mean.shape == (1, 6, 1)
    # the warm start's tail rows (shifted past the end) repeat the last row
    tail = np.asarray(new_mean[0, 3:])
    np.testing.assert_allclose(
        tail, np.broadcast_to(tail[:1], tail.shape), rtol=1e-6
    )


def test_mppi_regulates_double_integrator():
    """From x=1.5 MPPI must drive x toward 0; random actions must not."""
    horizon, act_dim = 15, 1
    plan = make_mppi_planner(
        _double_integrator_step, _reward_done,
        act_dim=act_dim, horizon=horizon, n_samples=128, lam=0.1, sigma=0.5,
    )
    obs0 = np.asarray([[1.5, 0.0]] * 4, np.float32)
    final, total = _rollout(
        plan, obs0, 40, jax.random.PRNGKey(1), horizon, act_dim
    )
    assert float(jnp.abs(final[:, 0]).max()) < 0.35, final

    # random-policy control for comparison
    key = jax.random.PRNGKey(2)
    obs = jnp.asarray(obs0)
    rand_total = jnp.zeros(4)
    for _ in range(40):
        key, sub = jax.random.split(key)
        a = jax.random.uniform(sub, (4, 1), minval=-1.0, maxval=1.0)
        nxt = _double_integrator_step(obs, a)
        r, _ = _reward_done(obs, nxt, a)
        rand_total = rand_total + r
        obs = nxt
    assert float(total.mean()) > float(rand_total.mean())


def test_mppi_respects_done():
    """Candidates that hit `done` accrue no further reward, so MPPI avoids
    the region where done fires even when it pays more per-step reward."""
    def step(obs, act):
        return obs + 0.2 * act

    def reward_done(obs, nxt, act):
        # reward grows with x, but x > 0.5 terminates
        r = nxt[..., 0]
        return r, nxt[..., 0] > 0.5

    plan = make_mppi_planner(
        step, reward_done, act_dim=1, horizon=20, n_samples=256,
        lam=0.1, sigma=0.5,
    )
    obs = jnp.zeros((2, 1))
    mean = jnp.zeros((2, 20, 1))
    acts, mean = plan(jax.random.PRNGKey(0), obs, mean)
    # the long-horizon optimum rides just below the boundary rather than
    # sprinting across it; the planned first action must be modest
    assert float(acts.max()) < 1.0


def test_sim_step_fn_roundtrip():
    """make_sim_step_fn applies normalization consistently with the
    learned-model evaluator."""
    from dadiff_tpu.envs.learned_model import DynamicsMLP, ModelStats
    from dadiff_tpu.envs.mppi_tpu import make_sim_step_fn

    model = DynamicsMLP(obs_dim=3, hidden=(8,))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 2))
    )["params"]
    stats = ModelStats(
        obs_mean=jnp.zeros(3), obs_std=jnp.ones(3),
        act_mean=jnp.zeros(2), act_std=jnp.ones(2),
        delta_mean=jnp.zeros(3), delta_std=jnp.ones(3),
    )
    step_fn = make_sim_step_fn(model, params, stats)
    obs = jnp.ones((4, 3))
    nxt = step_fn(obs, jnp.zeros((4, 2)))
    delta = model.apply({"params": params}, obs, jnp.zeros((4, 2)))
    np.testing.assert_allclose(np.asarray(nxt), np.asarray(obs + delta),
                               rtol=1e-6)


def test_ensemble_trains_and_ts_step():
    """4-member ensemble fits a linear system; the TS step function routes
    candidate groups to distinct members and matches manual application."""
    from dadiff_tpu.envs.learned_model import (
        make_ensemble_step_fn,
        train_dynamics_ensemble,
    )

    # linear system x' = x + 0.1*(Ax + Bu): ensemble should fit near-exactly
    rng = np.random.RandomState(0)
    A = np.asarray([[0.0, 1.0], [-1.0, -0.1]])
    B = np.asarray([[0.0], [1.0]])
    episodes = []
    for _ in range(8):
        x = rng.randn(2)
        obs, acts = [x.copy()], []
        for _ in range(50):
            u = rng.uniform(-1, 1, size=1)
            x = x + 0.1 * (A @ x + B @ u)
            obs.append(x.copy())
            acts.append(u.copy())
        episodes.append({
            "observations": np.asarray(obs, np.float32),
            "actions": np.asarray(acts, np.float32),
            "rewards": np.zeros(50, np.float32),
        })

    model, stacked, stats, metrics = train_dynamics_ensemble(
        episodes, n_models=4, hidden=(32, 32), n_steps=600, batch_size=128,
        seed=0,
    )
    assert metrics["r2_mean"] > 0.95, metrics
    assert len(metrics["member_r2"]) == 4

    step_fn = make_ensemble_step_fn(model, stacked, stats, n_samples=8)
    obs = jnp.asarray(rng.randn(8, 3, 2), jnp.float32)
    act = jnp.asarray(rng.uniform(-1, 1, (8, 3, 1)), jnp.float32)
    nxt = step_fn(obs, act)
    assert nxt.shape == obs.shape

    # candidate k must be served by member k // (N/E): check group 0 against
    # a manual single-member application
    p0 = jax.tree_util.tree_map(lambda x: x[0], stacked)
    o_n = (obs[:2] - stats.obs_mean) / stats.obs_std
    a_n = (act[:2] - stats.act_mean) / stats.act_std
    d_n = model.apply({"params": p0}, o_n, a_n)
    expect = obs[:2] + d_n * stats.delta_std + stats.delta_mean
    np.testing.assert_allclose(
        np.asarray(nxt[:2]), np.asarray(expect), rtol=1e-5, atol=1e-5
    )

    # indivisible n_samples rejected
    with pytest.raises(ValueError):
        make_ensemble_step_fn(model, stacked, stats, n_samples=6)


def test_mppi_planner_with_ensemble_step():
    """The planner composes with the grouped ensemble step function."""
    from dadiff_tpu.envs.learned_model import DynamicsMLP, ModelStats
    from dadiff_tpu.envs.mppi_tpu import make_mppi_planner

    model = DynamicsMLP(obs_dim=2, hidden=(8,))
    stacked = jax.vmap(
        lambda k: model.init(k, jnp.zeros((1, 2)), jnp.zeros((1, 1)))["params"]
    )(jax.random.split(jax.random.PRNGKey(0), 2))
    stats = ModelStats(
        obs_mean=jnp.zeros(2), obs_std=jnp.ones(2),
        act_mean=jnp.zeros(1), act_std=jnp.ones(1),
        delta_mean=jnp.zeros(2), delta_std=jnp.ones(2),
    )
    from dadiff_tpu.envs.learned_model import make_ensemble_step_fn

    step_fn = make_ensemble_step_fn(model, stacked, stats, n_samples=16)
    plan = make_mppi_planner(
        step_fn, _reward_done, act_dim=1, horizon=4, n_samples=16,
    )
    acts, mean = plan(
        jax.random.PRNGKey(1), jnp.ones((3, 2)), jnp.zeros((3, 4, 1))
    )
    assert acts.shape == (3, 1, 1)
    assert bool(jnp.all(jnp.isfinite(mean)))


def test_mppi_colored_noise_smooths_plans():
    """noise_beta low-passes the search noise: the selected action
    sequence's mean squared step-to-step jump drops vs white noise, while
    control quality on the double integrator stays comparable."""
    kw = dict(act_dim=1, horizon=16, n_samples=64, lam=0.3, sigma=0.6)
    white = make_mppi_planner(_double_integrator_step, _reward_done, **kw)
    colored = make_mppi_planner(
        _double_integrator_step, _reward_done, noise_beta=0.85, **kw
    )
    obs = jnp.asarray([[1.5, 0.0]] * 4)
    mean = jnp.zeros((4, 16, 1))

    def jerk(plan, key):
        _, m = plan(key, obs, mean)
        d = m[:, 1:] - m[:, :-1]
        return float(jnp.mean(d**2))

    keys = [jax.random.PRNGKey(i) for i in range(5)]
    jw = np.mean([jerk(white, k) for k in keys])
    jc = np.mean([jerk(colored, k) for k in keys])
    assert jc < jw * 0.6, (jc, jw)

    # quality: colored-noise planner still regulates the integrator
    # (null policy from x=1.5 scores -(1.5^2)*30 = -67.5)
    _, tot = _rollout(colored, [[1.5, 0.0]], 30, jax.random.PRNGKey(7),
                      16, 1)
    assert float(tot[0]) > -45.0


def test_mppi_jerk_penalty_biases_selection():
    """smooth_weight subtracts sum||da||^2 from candidate scores: the
    weighted-mean plan gets smoother as the weight grows."""
    kw = dict(act_dim=1, horizon=16, n_samples=64, lam=0.3, sigma=0.6)
    plain = make_mppi_planner(_double_integrator_step, _reward_done, **kw)
    pen = make_mppi_planner(
        _double_integrator_step, _reward_done, smooth_weight=5.0, **kw
    )
    obs = jnp.asarray([[1.5, 0.0]] * 4)
    mean = jnp.zeros((4, 16, 1))
    key = jax.random.PRNGKey(3)
    _, m0 = plain(key, obs, mean)
    _, m1 = pen(key, obs, mean)
    j0 = float(jnp.mean((m0[:, 1:] - m0[:, :-1]) ** 2))
    j1 = float(jnp.mean((m1[:, 1:] - m1[:, :-1]) ** 2))
    assert j1 < j0, (j1, j0)


def test_mppi_colored_noise_unit_variance():
    """AR(1) normalization keeps the stationary std at sigma (the lever
    changes the SPECTRUM, not the exploration scale)."""
    import dadiff_tpu.envs.mppi_tpu as M

    # reconstruct the colored noise exactly as plan() draws it
    n, B, H, m = 256, 2, 64, 3
    beta = 0.9
    key = jax.random.PRNGKey(0)
    eps = jax.random.normal(key, (n, B, H, m))
    scale = jnp.sqrt(1 - beta**2)

    def ar(c, e):
        c = beta * c + scale * e
        return c, c

    _, col = jax.lax.scan(ar, jnp.zeros((n, B, m)), jnp.moveaxis(eps, 2, 0))
    tail = jnp.moveaxis(col, 0, 2)[:, :, H // 2:]  # past burn-in
    assert abs(float(tail.std()) - 1.0) < 0.1


def test_collect_batch_colored_execution_noise():
    """explore_beta low-passes execution noise: consecutive applied-noise
    steps on the noisy envs are positively correlated, and noise state
    resets at episode boundaries."""
    from dadiff_tpu.envs.mppi_tpu import _collect_batch

    class _StubEnv:
        class _Space:
            shape = (2,)

        observation_space = _Space()

        def reset(self, seed=None):
            return np.zeros(2, np.float32), {}

        def step(self, a):
            return np.zeros(2, np.float32), 0.0, False, False, {}

    def plan(key, obs, mean):
        # deterministic zero nominal actions: recorded actions == noise
        return jnp.zeros((obs.shape[0], 2, 1)), mean

    envs = [_StubEnv() for _ in range(3)]
    eps = _collect_batch(
        envs, plan, horizon=4, act_dim=1, n_episodes=3, max_steps=20,
        explore_sigma=0.3, rng=np.random.RandomState(0), env_seed=0,
        jnp=jnp, jax=jax, explore_beta=0.9, verbose=False,
    )
    acts = np.concatenate([e["actions"][:, 0] for e in eps])
    # noisy env is env 0 (first third of the batch): its recorded actions
    # are the colored noise; lag-1 autocorrelation must be clearly positive
    noisy_acts = eps[0]["actions"][:, 0] if len(eps[0]["actions"]) else acts
    a = noisy_acts - noisy_acts.mean()
    if a.std() > 0:
        rho = float(np.corrcoef(a[:-1], a[1:])[0, 1])
        assert rho > 0.3, rho
