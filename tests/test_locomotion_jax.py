"""PlanarGymEnv family: gym-semantics parity with the real gymnasium envs.

The env the reference steps on the host per action (evaluate.py:240) is
replaced by an exact TPU-resident equivalent; these tests pin obs/reward/
termination parity for all three locomotion tasks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")
gym = pytest.importorskip("gymnasium")

from dadiff_tpu.envs.locomotion_jax import (  # noqa: E402
    HalfCheetahJax,
    HopperJax,
    Walker2dJax,
    make_physics_step_fn,
    physics_env_for,
)


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_registry():
    assert isinstance(physics_env_for("HalfCheetah-v5"), HalfCheetahJax)
    assert isinstance(physics_env_for("Hopper-v5"), HopperJax)
    assert isinstance(physics_env_for("Walker2d-v5"), Walker2dJax)
    with pytest.raises(ValueError):
        physics_env_for("PointMaze_UMaze-v3")


def test_obs_state_roundtrip():
    dev = HalfCheetahJax(solver_iters=50)
    obs = jnp.asarray(np.random.RandomState(0).randn(4, 17))
    qpos, qvel = dev.obs_to_state(obs)
    assert qpos.shape == (4, 9) and qvel.shape == (4, 9)
    np.testing.assert_allclose(np.asarray(qpos[:, 0]), 0.0)
    np.testing.assert_allclose(
        np.asarray(dev.state_to_obs(qpos, qvel)), np.asarray(obs)
    )


@pytest.mark.parametrize("cls,name,iters", [
    (HalfCheetahJax, "HalfCheetah-v5", 150),
    # mu=2 foot contacts condition the QP worse: more PGS iterations
    (HopperJax, "Hopper-v5", 500),
    (Walker2dJax, "Walker2d-v5", 400),
])
def test_env_step_matches_gym(cls, name, iters):
    """obs, reward, AND termination of full env steps match gymnasium."""
    host = gym.make(name)
    dev = cls(solver_iters=iters)
    step = jax.jit(dev.step)
    rng = np.random.RandomState(1)
    host.reset(seed=0)
    qpos = host.unwrapped.data.qpos.copy()
    qvel = host.unwrapped.data.qvel.copy()
    obs_errs, rew_errs = [], []
    for t in range(12):
        act = np.clip(rng.randn(dev.act_dim) * 0.5, -1, 1)
        obs_h, rew_h, term_h, trunc_h, _ = host.step(act)
        qp, qv, obs_j, rew_j, done_j = step(
            jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(act)
        )
        obs_errs.append(np.abs(np.asarray(obs_j) - obs_h).max())
        rew_errs.append(abs(float(rew_j) - rew_h))
        assert bool(done_j) == bool(term_h)
        if term_h or trunc_h:
            host.reset(seed=100 + t)
        qpos = host.unwrapped.data.qpos.copy()
        qvel = host.unwrapped.data.qvel.copy()
    host.close()
    # typical steps are solver-exact; Hopper/Walker's solimp d0=0.8 makes
    # contact activation DISCONTINUOUS at the margin boundary, so FP-level
    # dist differences occasionally flip a knife-edge constraint — bounded
    # small divergences, hence median/max rather than per-step assertions
    assert np.median(obs_errs) < 2e-5, obs_errs
    assert max(obs_errs) < 1e-3, obs_errs
    assert np.median(rew_errs) < 2e-5 and max(rew_errs) < 1e-3


def test_hopper_termination_fires():
    """An unhealthy hopper state terminates exactly like gym's is_healthy."""
    dev = HopperJax(solver_iters=50)
    qpos = jnp.asarray([0.0, 0.5, 0.0, 0.0, 0.0, 0.0])  # z below 0.7
    qvel = jnp.zeros(6)
    assert not bool(dev.healthy(qpos, qvel))
    qpos = qpos.at[1].set(1.25)
    assert bool(dev.healthy(qpos, qvel))
    # angle beyond 0.2
    assert not bool(dev.healthy(qpos.at[2].set(0.3), qvel))


def test_search_model_smaller():
    full = HalfCheetahJax(solver_iters=20)
    search = HalfCheetahJax(solver_iters=20, search_model=True)
    assert len(search.model.con_body) < len(full.model.con_body)
    assert search.phys.pyramid_edges == 2 and full.phys.pyramid_edges == 4


def test_physics_step_fn_shapes():
    dev = HopperJax(solver_iters=30, solver="jacobi", search_model=True)
    fn = make_physics_step_fn(dev)
    obs = jnp.asarray(np.random.RandomState(2).randn(3, 5, 11) * 0.05)
    act = jnp.asarray(np.random.RandomState(3).randn(3, 5, 3) * 0.5)
    out = jax.jit(fn)(obs, act)
    assert out.shape == (3, 5, 11)
    assert np.isfinite(np.asarray(out)).all()
