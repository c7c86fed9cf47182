"""HalfCheetahJax: gym-semantics parity with the real gymnasium env."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")
gym = pytest.importorskip("gymnasium")

from dadiff_tpu.envs.halfcheetah_jax import HalfCheetahJax  # noqa: E402


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def envs():
    host = gym.make("HalfCheetah-v5")
    dev = HalfCheetahJax(solver_iters=150)
    yield host, dev
    host.close()


def test_obs_state_roundtrip(envs):
    _, dev = envs
    obs = jnp.asarray(np.random.RandomState(0).randn(4, 17))
    qpos, qvel = dev.obs_to_state(obs)
    assert qpos.shape == (4, 9) and qvel.shape == (4, 9)
    np.testing.assert_allclose(np.asarray(qpos[:, 0]), 0.0)
    np.testing.assert_allclose(
        np.asarray(dev.state_to_obs(qpos, qvel)), np.asarray(obs)
    )


def test_env_step_matches_gym(envs):
    """obs and reward of a full env step match gymnasium exactly (the env
    the reference steps on the host per action, evaluate.py:240)."""
    host, dev = envs
    step = jax.jit(dev.step)
    rng = np.random.RandomState(1)
    obs, _ = host.reset(seed=0)
    qpos = host.unwrapped.data.qpos.copy()
    qvel = host.unwrapped.data.qvel.copy()
    for t in range(10):
        act = np.clip(rng.randn(6) * 0.5, -1, 1)
        obs_h, rew_h, *_ = host.step(act)
        qp, qv, obs_j, rew_j = step(
            jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(act)
        )
        # x-velocity reward depends on rootx delta: compare directly
        np.testing.assert_allclose(float(rew_j), rew_h, atol=1e-6)
        np.testing.assert_allclose(np.asarray(obs_j), obs_h, atol=1e-6)
        qpos = host.unwrapped.data.qpos.copy()
        qvel = host.unwrapped.data.qvel.copy()


def test_batched_rollout_shapes(envs):
    _, dev = envs
    rng = np.random.RandomState(2)
    obs0 = jnp.asarray(rng.randn(3, 17) * 0.05)
    qpos, qvel = dev.obs_to_state(obs0)
    acts = jnp.asarray(np.clip(rng.randn(3, 7, 6), -1, 1))
    obs, rew = jax.jit(dev.rollout)(qpos, qvel, acts)
    assert obs.shape == (3, 7, 17) and rew.shape == (3, 7)
    assert np.isfinite(np.asarray(rew)).all()
