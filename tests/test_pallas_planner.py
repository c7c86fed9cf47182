"""Batched best-of-N planning megakernel (ops/pallas_planner.py).

All kernel runs use interpret mode on the CPU backend (conftest);
references are the already-verified XLA pieces: p_mean_variance
(torch-parity-tested) + apply_projection (reference-layout-tested) composed
exactly as guides/sampling.make_sampler's DDPM body.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
from dadiff_tpu.guides.sampling import (
    Conditions,
    ProjectionSpec,
    conditions_for_initial_obs,
)
from dadiff_tpu.models.diffusion import GaussianDiffusion, p_mean_variance
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.pallas_planner import (
    build_interleaved_projection,
    make_pallas_bo_sampler,
    make_pallas_planner_chain,
)
from dadiff_tpu.ops.pallas_unet import prepare_chain_operands
from dadiff_tpu.ops.projection import (
    NormStats,
    apply_projection,
    projection_alpha,
)

H, OBS, ACT = 8, 6, 2
D = OBS + ACT
STATE = 4
T_STEPS = 6


def _setup(seed=0):
    unet = TemporalUnet(transition_dim=D, dim=32, dim_mults=(1, 2))
    diffusion = GaussianDiffusion(
        model=unet, horizon=H, observation_dim=OBS, action_dim=ACT,
        n_timesteps=T_STEPS,
    )
    params = diffusion.init_params(jax.random.PRNGKey(seed))
    return unet, diffusion, params


def _proj_setup():
    A = np.eye(STATE) + 0.1 * np.eye(STATE, k=2)
    B = np.zeros((STATE, ACT))
    B[2:, :] = 0.1 * np.eye(ACT)
    P = ProjectionMatrixBuilder(A, B, STATE, ACT).get_projection_matrix(H)
    rng = np.random.RandomState(3)
    stats = NormStats(
        obs_mean=jnp.asarray(rng.randn(OBS), jnp.float32),
        obs_std=jnp.asarray(0.5 + rng.rand(OBS), jnp.float32),
        action_mean=jnp.asarray(rng.randn(ACT), jnp.float32),
        action_std=jnp.asarray(0.5 + rng.rand(ACT), jnp.float32),
    )
    return jnp.asarray(P), stats


def test_interleaved_projection_matches_apply_projection():
    P, stats = _proj_setup()
    M, b = build_interleaved_projection(
        P, stats, observation_dim=OBS, action_dim=ACT,
        state_dim=STATE, horizon=H,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (3, H, D))
    for alpha in (1.0, 0.35):
        want = apply_projection(
            x, P, jnp.asarray(alpha), stats,
            observation_dim=OBS, action_dim=ACT, state_dim=STATE,
        )
        x_flat = x.reshape(3, H * D)
        got = alpha * (x_flat @ M + b) + (1 - alpha) * x_flat
        np.testing.assert_allclose(
            np.asarray(got.reshape(3, H, D)), np.asarray(want),
            rtol=2e-4, atol=2e-4,
        )


def _reference_chain(diffusion, params, x0, step_noise, cond, *,
                     P=None, stats=None, spec=None):
    """make_sampler's DDPM body with injected noise (the XLA ground truth)."""
    schedule = diffusion.schedule
    wall_grid = (
        jnp.asarray(spec.wall_grid, jnp.int32)
        if spec is not None and spec.wall_grid is not None else None
    )
    x = cond.apply(x0)
    for i, t in enumerate(range(T_STEPS - 1, -1, -1)):
        t_b = jnp.full((x.shape[0],), t, jnp.int32)
        out = diffusion.apply(params, x, t_b)
        mean, log_var = p_mean_variance(
            out, schedule, x, t_b,
            clip_denoised=diffusion.clip_denoised,
            predict_epsilon=diffusion.predict_epsilon,
        )
        nonzero = float(t != 0)
        x = mean + nonzero * jnp.exp(0.5 * log_var) * step_noise[i]
        if spec is not None:
            alpha = projection_alpha(
                jnp.asarray(t), diffusion.n_timesteps, spec.schedule,
                spec.strength, schedule.betas,
            )
            x = apply_projection(
                x, P, alpha, stats,
                observation_dim=OBS, action_dim=ACT, state_dim=STATE,
                wall_grid=wall_grid, wall_margin=spec.wall_margin,
            )
        x = cond.apply(x)
    return x


def _run_kernel(diffusion, params, x0, step_noise, cond_values, *,
                n_chains, n_groups, projection=False, M=None, b=None,
                wall_grid=None, pos_stats=None, wall_margin=None,
                spec=None):
    unet = diffusion.model
    schedule = diffusion.schedule
    chain = make_pallas_planner_chain(
        unet, schedule, H, n_chains, n_groups,
        projection=projection, wall_grid=wall_grid, pos_stats=pos_stats,
        wall_margin=wall_margin,
        weight_dtype=jnp.float32, interpret=True,
    )
    flat_w, m_embs, scal = prepare_chain_operands(
        unet, schedule, params, chain.timesteps, weight_dtype=jnp.float32
    )
    if projection:
        alphas = projection_alpha(
            chain.timesteps, diffusion.n_timesteps, spec.schedule,
            spec.strength, schedule.betas,
        )
        scal = scal.at[:, 5].set(alphas)
    C = n_chains * n_groups
    out = chain(
        flat_w,
        x0.reshape(C * H, D),
        m_embs,
        step_noise.reshape(T_STEPS, C * H, D),
        scal,
        cond_values.reshape(C * H, D),
        M, b,
    )
    return out.reshape(C, H, D)


def test_batched_chain_matches_xla_reference():
    _, diffusion, params = _setup()
    C = 4  # 2 chains x 2 groups
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (C, H, D))
    step_noise = jax.random.normal(k2, (T_STEPS, C, H, D))
    obs = jax.random.normal(k3, (C, OBS))
    cond = conditions_for_initial_obs(obs, OBS, H, D)

    want = _reference_chain(diffusion, params, x0, step_noise, cond)
    got = _run_kernel(
        diffusion, params, x0, step_noise, cond.values,
        n_chains=2, n_groups=2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_batched_chain_chains_are_independent():
    """Row-stacking must not leak across chain boundaries: running chain c
    alone equals running it stacked with different neighbors."""
    _, diffusion, params = _setup()
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (3, H, D))
    step_noise = jax.random.normal(k2, (T_STEPS, 3, H, D))
    obs = jax.random.normal(k3, (3, OBS))
    cond = conditions_for_initial_obs(obs, OBS, H, D)

    stacked = _run_kernel(
        diffusion, params, x0, step_noise, cond.values,
        n_chains=3, n_groups=1,
    )
    solo = _run_kernel(
        diffusion, params, x0[1:2], step_noise[:, 1:2],
        cond.values[1:2], n_chains=1, n_groups=1,
    )
    np.testing.assert_allclose(np.asarray(stacked[1]), np.asarray(solo[0]),
                               rtol=2e-3, atol=2e-3)


def test_projected_chain_matches_xla_reference():
    _, diffusion, params = _setup()
    P, stats = _proj_setup()
    spec = ProjectionSpec(state_dim=STATE, schedule="noise_schedule",
                          strength=0.8)
    M, b = build_interleaved_projection(
        P, stats, observation_dim=OBS, action_dim=ACT,
        state_dim=STATE, horizon=H,
    )
    C = 2
    key = jax.random.PRNGKey(13)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (C, H, D))
    step_noise = jax.random.normal(k2, (T_STEPS, C, H, D))
    obs = jax.random.normal(k3, (C, OBS))
    cond = conditions_for_initial_obs(obs, OBS, H, D)

    want = _reference_chain(
        diffusion, params, x0, step_noise, cond, P=P, stats=stats, spec=spec
    )
    got = _run_kernel(
        diffusion, params, x0, step_noise, cond.values,
        n_chains=2, n_groups=1, projection=True,
        M=jnp.asarray(M), b=jnp.asarray(b), spec=spec,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=3e-3)


def test_wall_aware_projected_chain_matches_xla_reference():
    _, diffusion, params = _setup()
    P, stats = _proj_setup()
    grid = tuple(
        tuple(int(v) for v in row)
        for row in np.array([
            [1, 1, 1, 1, 1],
            [1, 0, 0, 0, 1],
            [1, 0, 1, 0, 1],
            [1, 0, 0, 0, 1],
            [1, 1, 1, 1, 1],
        ])
    )
    spec = ProjectionSpec(state_dim=STATE, schedule="noise_schedule",
                          strength=0.8, wall_grid=grid)
    M, b = build_interleaved_projection(
        P, stats, observation_dim=OBS, action_dim=ACT,
        state_dim=STATE, horizon=H,
    )
    C = 2
    key = jax.random.PRNGKey(17)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (C, H, D))
    step_noise = jax.random.normal(k2, (T_STEPS, C, H, D))
    obs = jax.random.normal(k3, (C, OBS))
    cond = conditions_for_initial_obs(obs, OBS, H, D)

    want = _reference_chain(
        diffusion, params, x0, step_noise, cond, P=P, stats=stats, spec=spec
    )
    got = _run_kernel(
        diffusion, params, x0, step_noise, cond.values,
        n_chains=2, n_groups=1, projection=True,
        M=jnp.asarray(M), b=jnp.asarray(b), spec=spec,
        wall_grid=np.asarray(grid),
        pos_stats=(
            (float(stats.obs_mean[0]), float(stats.obs_mean[1])),
            (float(stats.obs_std[0]), float(stats.obs_std[1])),
        ),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=3e-3)


def test_bo_sampler_end_to_end():
    _, diffusion, params = _setup()
    P, stats = _proj_setup()
    spec = ProjectionSpec(state_dim=STATE, schedule="noise_schedule")
    plan = make_pallas_bo_sampler(
        diffusion, projection_spec=spec, P=P, stats=stats,
        n_candidates=4, group_chains=8, weight_dtype=jnp.float32,
        interpret=True,
    )
    obs = jax.random.normal(jax.random.PRNGKey(5), (3, OBS))
    cond = conditions_for_initial_obs(obs, OBS, H, D)
    out = plan(params, jax.random.PRNGKey(6), cond)
    assert out.shape == (3, H, D)
    assert np.all(np.isfinite(np.asarray(out)))
    # conditioning held: row 0 equals the conditioned observation
    np.testing.assert_allclose(
        np.asarray(out[:, 0, :OBS]), np.asarray(obs), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out[:, 0, OBS:]), 0.0, atol=1e-5)


def test_wire_policy_megakernel(setupless=None):
    """The policy-layer megakernel wiring: same host logic, sampler call
    replaced, candidate selection moved in-path."""
    from dadiff_tpu.guides.policies import DynamicsAwarePolicy
    from dadiff_tpu.ops.pallas_planner import wire_policy_megakernel

    unet, diffusion, params = _setup()[0], *_setup()[1:]  # noqa
    P, stats = _proj_setup()

    class _Norm:
        obs_mean = np.zeros(OBS, np.float32)
        obs_std = np.ones(OBS, np.float32)
        action_mean = np.zeros(ACT, np.float32)
        action_std = np.ones(ACT, np.float32)

        def normalize_observations(self, x):
            return np.asarray(x, np.float32)

        def unnormalize_observations(self, x):
            return np.asarray(x, np.float32)

        def unnormalize_actions(self, x):
            return np.asarray(x, np.float32)

    policy = DynamicsAwarePolicy(
        diffusion, projection_matrix=np.asarray(P), normalizer=_Norm(),
        params=params, state_dim=STATE, action_horizon=4, n_candidates=4,
    )
    wire_policy_megakernel(policy, n_candidates=4, group_chains=4,
                           interpret=True)
    assert policy.n_candidates == 1 and policy.megakernel
    a = policy.get_action(np.zeros(OBS, np.float32))
    assert a.shape == (ACT,)
    traj = policy.plan(np.ones(OBS, np.float32) * 0.1)
    assert traj.shape == (1, H, D)
    assert np.all(np.isfinite(traj))
