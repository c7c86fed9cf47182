"""Obstacle-aware projection (round-2, VERDICT #3): rows the projection
drags into wall cells revert to their unprojected values."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.dynamics.extractor import double_integrator_dynamics
from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
from dadiff_tpu.ops.projection import (
    NormStats,
    apply_projection,
    wall_violation_mask,
)

OBS_DIM, ACT_DIM, STATE_DIM, H = 6, 2, 4, 8

# 5x5 umaze: free cells at rows 1-3 (see envs/pointmaze_jax.py)
UMAZE = (
    (1, 1, 1, 1, 1),
    (1, 0, 0, 0, 1),
    (1, 1, 1, 0, 1),
    (1, 0, 0, 0, 1),
    (1, 1, 1, 1, 1),
)


def test_wall_violation_mask_basic():
    grid = jnp.asarray(UMAZE, jnp.int32)
    # center cell of a 5x5 maze is (row 2, col 2): a wall in umaze
    pos = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [-1.0, -1.0]])
    # (0,0) -> row 2, col 2 = wall; (1,1) -> row 1, col 3 = free;
    # (-1,-1) -> row 3, col 1 = free
    mask = wall_violation_mask(pos, grid)
    np.testing.assert_array_equal(np.asarray(mask), [True, False, False])


def test_wall_violation_mask_out_of_bounds_clips():
    grid = jnp.asarray(UMAZE, jnp.int32)
    pos = jnp.asarray([[100.0, 100.0], [-100.0, -100.0]])
    mask = wall_violation_mask(pos, grid)
    # clipped to border cells, which are walls
    np.testing.assert_array_equal(np.asarray(mask), [True, True])


def _projection_inputs():
    A, B = double_integrator_dynamics(0.1)
    P = jnp.asarray(
        ProjectionMatrixBuilder(A, B, STATE_DIM, ACT_DIM).get_projection_matrix(H),
        jnp.float32,
    )
    stats = NormStats.identity(OBS_DIM, ACT_DIM)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, H, OBS_DIM + ACT_DIM))
    return x, P, stats


def test_wall_grid_none_matches_plain_projection():
    x, P, stats = _projection_inputs()
    a = apply_projection(
        x, P, jnp.asarray(1.0), stats,
        observation_dim=OBS_DIM, action_dim=ACT_DIM, state_dim=STATE_DIM,
    )
    b = apply_projection(
        x, P, jnp.asarray(1.0), stats,
        observation_dim=OBS_DIM, action_dim=ACT_DIM, state_dim=STATE_DIM,
        wall_grid=None,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_wall_rows_revert_to_unprojected():
    x, P, stats = _projection_inputs()
    # all-wall grid: every projected row violates -> output == input
    all_wall = jnp.ones((5, 5), jnp.int32)
    out = apply_projection(
        x, P, jnp.asarray(1.0), stats,
        observation_dim=OBS_DIM, action_dim=ACT_DIM, state_dim=STATE_DIM,
        wall_grid=all_wall,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    # all-free grid: no row violates -> identical to plain projection
    all_free = jnp.zeros((5, 5), jnp.int32)
    out_free = apply_projection(
        x, P, jnp.asarray(1.0), stats,
        observation_dim=OBS_DIM, action_dim=ACT_DIM, state_dim=STATE_DIM,
        wall_grid=all_free,
    )
    plain = apply_projection(
        x, P, jnp.asarray(1.0), stats,
        observation_dim=OBS_DIM, action_dim=ACT_DIM, state_dim=STATE_DIM,
    )
    np.testing.assert_allclose(np.asarray(out_free), np.asarray(plain))


def test_maze_maps_match_gymnasium_robotics():
    maps = pytest.importorskip("gymnasium_robotics.envs.maze.maps")
    from dadiff_tpu.envs.pointmaze_jax import MAZE_MAPS

    for ours, theirs in [
        ("umaze", maps.U_MAZE),
        ("medium", maps.MEDIUM_MAZE),
        ("large", maps.LARGE_MAZE),
        ("open", maps.OPEN),
    ]:
        np.testing.assert_array_equal(
            np.asarray(MAZE_MAPS[ours]), np.asarray(theirs),
            err_msg=f"map {ours} diverges from gymnasium-robotics",
        )


def test_dynamics_aware_policy_wall_aware_end_to_end():
    from dadiff_tpu.datasets.normalization import DatasetNormalizer
    from dadiff_tpu.guides.policies import DynamicsAwarePolicy
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=H, observation_dim=OBS_DIM, action_dim=ACT_DIM,
        n_timesteps=5,
    )
    params = d.init_params(jax.random.PRNGKey(0))
    A, B = double_integrator_dynamics(0.1)
    P = ProjectionMatrixBuilder(A, B, STATE_DIM, ACT_DIM).get_projection_matrix(H)
    rs = np.random.RandomState(0)
    normalizer = DatasetNormalizer(rs.randn(50, OBS_DIM), rs.randn(50, ACT_DIM))

    policy = DynamicsAwarePolicy(
        d, projection_matrix=P, normalizer=normalizer, params=params,
        state_dim=STATE_DIM, wall_grid=UMAZE,
    )
    assert policy._plan is not None
    action = policy.get_action(np.zeros(OBS_DIM, np.float32))
    assert action.shape == (ACT_DIM,)
    assert np.isfinite(action).all()


def test_wall_mask_respects_agent_radius():
    """wall_violation_mask probes the agent-radius corners like the env's
    collision check: a point within AGENT_RADIUS of a wall cell boundary is
    a violation even though its center cell is free."""
    import jax.numpy as jnp
    from dadiff_tpu.envs.pointmaze_jax import AGENT_RADIUS, MAZE_MAPS
    from dadiff_tpu.ops.projection import wall_violation_mask

    grid = jnp.asarray(MAZE_MAPS["umaze"], jnp.int32)
    # umaze row 2 = [1,1,1,0,1]: cell (2,3) free, (2,2) wall.
    # cell (2,3) spans x in [0.5, 1.5], y in [-0.5, 0.5] (5x5 map)
    center = jnp.asarray([[1.0, 0.0]])
    near_wall = jnp.asarray([[0.5 + AGENT_RADIUS / 2, 0.0]])  # overlaps (2,2)
    inside_wall = jnp.asarray([[0.0, 0.0]])
    m = AGENT_RADIUS
    assert not bool(wall_violation_mask(center, grid, margin=m)[0])
    assert bool(wall_violation_mask(near_wall, grid, margin=m)[0])
    assert bool(wall_violation_mask(inside_wall, grid, margin=m)[0])
    # default (margin 0, the measured-best config): center-cell only
    assert not bool(wall_violation_mask(near_wall, grid)[0])
    assert bool(wall_violation_mask(inside_wall, grid)[0])


def test_wall_penalty_scorer_prefers_executable_candidate():
    """A plan that ends slightly farther from the goal but stays out of
    walls must beat a closer plan that cuts through a wall cell."""
    from dadiff_tpu.guides.policies import (
        make_goal_distance_scorer,
        make_wall_penalty_scorer,
    )

    grid = jnp.asarray(UMAZE, jnp.int32)
    obs_mean = np.zeros(OBS_DIM, np.float32)
    obs_std = np.ones(OBS_DIM, np.float32)
    H_ = 8
    goal = np.asarray([1.0, 1.0], np.float32)
    # normed_obs: positions at dims 0:2, goal at last two dims
    normed_obs = jnp.asarray(np.concatenate([[-1.0, -1.0, 0, 0], goal]))

    # candidate 0: straight line through the center wall, ends AT the goal
    cut = np.stack([
        np.linspace(-1.0, 1.0, H_), np.linspace(-1.0, 1.0, H_)
    ], -1)
    # candidate 1: hugs the free right corridor (x=1), ends slightly short
    detour = np.stack([
        np.concatenate([np.full(H_ // 2, 1.0), np.full(H_ // 2, 1.0)]),
        np.concatenate([np.linspace(-1.0, 0.0, H_ // 2),
                        np.linspace(0.0, 0.85, H_ // 2)]),
    ], -1)
    trajs = np.zeros((2, H_, OBS_DIM + ACT_DIM), np.float32)
    trajs[0, :, :2], trajs[1, :, :2] = cut, detour
    trajs = jnp.asarray(trajs)

    plain = make_goal_distance_scorer(obs_mean, obs_std)
    walled = make_wall_penalty_scorer(obs_mean, obs_std, grid, penalty=5.0)
    s_plain = np.asarray(plain(trajs, normed_obs))
    s_wall = np.asarray(walled(trajs, normed_obs))
    # plain goal distance picks the wall-cutter; the penalty flips it
    assert s_plain[0] < s_plain[1]
    assert s_wall[1] < s_wall[0]
    # penalty equals 5 * fraction-of-rows-in-walls on top of goal distance
    assert s_wall[1] == pytest.approx(s_plain[1], abs=1e-5)
