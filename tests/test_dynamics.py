"""Dynamics subsystem tests (reference semantics: projection.py:43-133,
data_driven.py:75-134, extractor.py:505-530, registry.py:37-112)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
from dadiff_tpu.dynamics.extractor import double_integrator_dynamics
from dadiff_tpu.dynamics.data_driven import (
    extract_transitions_from_episodes,
    fit_linear_dynamics,
    identify_dynamics_from_data,
)
from dadiff_tpu.dynamics.registry import get_dynamics_for_env
from dadiff_tpu.datasets import sources
from dadiff_tpu.ops.projection import (
    NormStats,
    apply_projection,
    from_concatenated,
    projection_alpha,
    projection_residual,
    to_concatenated,
)


@pytest.fixture(scope="module")
def di():
    return double_integrator_dynamics(dt=0.1)


@pytest.fixture(scope="module")
def P8(di):
    A, B = di
    return ProjectionMatrixBuilder(A, B, 4, 2).get_projection_matrix(8)


def test_F_matrix_structure(di):
    A, B = di
    builder = ProjectionMatrixBuilder(A, B, 4, 2)
    T = 5
    F = builder.build_F_matrix(T)
    assert F.shape == ((T + 1) * 4 + T * 2, 4 + T * 2)
    # top-left block: stacked powers of A
    np.testing.assert_allclose(F[:4, :4], np.eye(4))
    np.testing.assert_allclose(F[4:8, :4], A)
    np.testing.assert_allclose(F[8:12, :4], A @ A)
    # C_T first block column: A^{t-1} B
    np.testing.assert_allclose(F[4:8, 4:6], B)
    np.testing.assert_allclose(F[8:12, 4:6], A @ B)
    # bottom-right identity
    np.testing.assert_allclose(F[(T + 1) * 4 :, 4:], np.eye(T * 2))


def test_projection_is_idempotent(P8):
    assert ProjectionMatrixBuilder.verify_projection(P8)
    assert P8.dtype == np.float32


def test_feasible_trajectory_is_fixed_point(di, P8):
    """A trajectory rolled out under (A,B) lies in col(F): P tau = tau."""
    A, B = di
    rng = np.random.RandomState(0)
    x = rng.randn(4)
    us = rng.randn(8, 2)
    xs = [x]
    for u in us:
        xs.append(A @ xs[-1] + B @ u)
    tau = np.concatenate([np.concatenate(xs), us.ravel()])
    tau_proj = tau @ P8
    np.testing.assert_allclose(tau_proj, tau, rtol=1e-4, atol=1e-4)


def test_infeasible_trajectory_moves(P8):
    rng = np.random.RandomState(1)
    tau = rng.randn(P8.shape[0])
    tau_p = tau @ P8
    assert not np.allclose(tau_p, tau, atol=1e-3)
    # projecting twice = projecting once
    np.testing.assert_allclose(tau_p @ P8, tau_p, rtol=1e-4, atol=1e-5)


def test_sysid_recovers_double_integrator(di):
    A, B = di
    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=10, episode_len=50)
    A_fit, B_fit, n, m = identify_dynamics_from_data(state_dim=4, episodes=eps)
    assert (n, m) == (4, 2)
    np.testing.assert_allclose(A_fit, A, atol=1e-5)
    np.testing.assert_allclose(B_fit, B, atol=1e-5)
    assert fit_linear_dynamics.last_r2 > 0.999


def test_sysid_truncates_goal_dims():
    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=4, episode_len=30)
    s, a, ns = extract_transitions_from_episodes(eps)
    assert s.shape[1] == 6  # goal included
    A, B = fit_linear_dynamics(s, a, ns, state_dim=4)
    assert A.shape == (4, 4) and B.shape == (4, 2)


def test_registry_with_episodes():
    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=4, episode_len=30)
    A, B, n, m = get_dynamics_for_env("PointMaze_UMaze-v3", episodes=eps)
    assert (n, m) == (4, 2)
    A_ref, B_ref = double_integrator_dynamics(0.1)
    np.testing.assert_allclose(A, A_ref, atol=1e-4)


def test_registry_analytical_fallback():
    """No dataset + no minari -> analytical double integrator for maze envs."""
    A, B, n, m = get_dynamics_for_env("PointMaze_UMaze-v3", dataset_name="nonexistent!!")
    A_ref, B_ref = double_integrator_dynamics(0.1)
    np.testing.assert_allclose(A, A_ref)
    np.testing.assert_allclose(B, B_ref)


# ---------------------------------------------------------------------------
# jit-side projection ops
# ---------------------------------------------------------------------------

def test_concat_layout_roundtrip():
    rng = np.random.RandomState(2)
    states = jnp.asarray(rng.randn(3, 8, 4).astype(np.float32))
    actions = jnp.asarray(rng.randn(3, 8, 2).astype(np.float32))
    xc = to_concatenated(states, actions)
    assert xc.shape == (3, 9 * 4 + 8 * 2)
    # duplicated final state present
    np.testing.assert_array_equal(np.asarray(xc[:, 8 * 4 : 9 * 4]), np.asarray(states[:, -1]))
    s2, a2 = from_concatenated(xc, 8, 4, 2)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(states))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(actions))


def test_projection_alpha_schedules():
    t = jnp.asarray(50)
    n = 100
    assert float(projection_alpha(t, n, "constant", 0.7)) == pytest.approx(0.7)
    assert float(projection_alpha(t, n, "linear", 1.0)) == pytest.approx(0.5)
    assert float(projection_alpha(t, n, "quadratic", 1.0)) == pytest.approx(0.25)
    betas = jnp.full((100,), 0.19)
    assert float(projection_alpha(t, n, "noise_schedule", 1.0, betas)) == pytest.approx(
        0.9, abs=1e-6
    )
    with pytest.raises(ValueError):
        projection_alpha(t, n, "bogus")


def test_apply_projection_at_rest_is_exact_fixed_point(P8):
    """A constant at-rest trajectory (v=0, u=0) is feasible even with the
    duplicated-final-state quirk -> exact fixed point; goals pass through."""
    pos = np.array([1.5, -0.7], np.float32)
    goal = np.array([9.0, 9.0], np.float32)
    obs = np.tile(np.concatenate([pos, [0, 0], goal]), (8, 1))
    act = np.zeros((8, 2), np.float32)
    x = jnp.asarray(np.concatenate([obs, act], axis=-1)[None].astype(np.float32))
    stats = NormStats(
        obs_mean=jnp.asarray(np.array([0.1, 0.2, 0, 0, 0, 0], np.float32)),
        obs_std=jnp.asarray(np.full(6, 2.0, np.float32)),
        action_mean=jnp.zeros(2),
        action_std=jnp.ones(2),
    )
    out = apply_projection(
        x, jnp.asarray(P8), jnp.asarray(1.0), stats,
        observation_dim=6, action_dim=2, state_dim=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_apply_projection_improves_feasibility(di, P8):
    """Projection strictly reduces the dynamics violation of a noisy
    trajectory (the property the sampler relies on)."""
    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=1, episode_len=9, seed=5)
    obs = eps[0]["observations"][:8]
    act = eps[0]["actions"][:8]
    rng = np.random.RandomState(0)
    noisy = np.concatenate([obs, act], axis=-1)[None].astype(np.float32)
    noisy += rng.randn(*noisy.shape).astype(np.float32) * 0.3
    x = jnp.asarray(noisy)
    stats = NormStats.identity(6, 2)

    def viol(x_):
        return float(
            projection_residual(
                x_, jnp.asarray(P8), stats,
                observation_dim=6, action_dim=2, state_dim=4,
            )
        )

    out = apply_projection(
        x, jnp.asarray(P8), jnp.asarray(1.0), stats,
        observation_dim=6, action_dim=2, state_dim=4,
    )
    assert viol(out) < 0.05 * viol(x)
    # goals untouched
    np.testing.assert_array_equal(np.asarray(out[..., 4:6]), np.asarray(x[..., 4:6]))


def test_apply_projection_alpha_zero_is_identity(P8):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    stats = NormStats.identity(6, 2)
    out = apply_projection(
        x, jnp.asarray(P8), jnp.asarray(0.0), stats,
        observation_dim=6, action_dim=2, state_dim=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_projection_residual_zero_on_feasible(di, P8):
    A, B = di
    rng = np.random.RandomState(4)
    x = rng.randn(4)
    us = rng.randn(8, 2)
    xs = [x]
    for u in us:
        xs.append(A @ xs[-1] + B @ u)
    states = np.stack(xs[:-1])  # interleaved uses H states
    # construct so the duplicated-final-state matches feasibility: replace the
    # true x_8 by duplicating x_7 makes it slightly infeasible; measure both
    traj = np.concatenate([states, np.zeros((8, 2)), ], axis=-1)
    traj[:, 4:6] = 0  # pretend goal dims
    full = np.concatenate([states, us], axis=-1)
    x_in = jnp.asarray(np.concatenate([full[:, :4], np.zeros((8, 2)), us], axis=-1)[None].astype(np.float32))
    stats = NormStats.identity(6, 2)
    r = projection_residual(
        x_in, jnp.asarray(P8), stats, observation_dim=6, action_dim=2, state_dim=4
    )
    # small but nonzero because of the duplicated-final-state approximation
    assert float(r) < 1e-2

    rand = jnp.asarray(rng.randn(1, 8, 8).astype(np.float32))
    r_rand = projection_residual(
        rand, jnp.asarray(P8), stats, observation_dim=6, action_dim=2, state_dim=4
    )
    assert float(r_rand) > float(r)
