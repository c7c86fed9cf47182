"""Env layer tests: pure-JAX PointMaze, host harness, on-device rollout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.envs.pointmaze_jax import MAZE_MAPS, PointMazeJax, PointMazeState
from dadiff_tpu.envs.host import evaluate_policy, save_results
from dadiff_tpu.envs.rollout import make_ondevice_evaluator
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.projection import NormStats


@pytest.fixture(scope="module")
def env():
    return PointMazeJax(map_name="umaze")


def test_reset_positions_in_free_space(env):
    state, obs = env.reset(jax.random.PRNGKey(0), batch_size=64)
    assert state.pos.shape == (64, 2)
    assert obs.shape == (64, 6)
    # no start position inside a wall
    assert not bool(env._is_wall(state.pos).any())
    assert not bool(env._is_wall(state.goal).any())
    np.testing.assert_array_equal(np.asarray(state.vel), 0.0)


def test_umaze_free_cells():
    maze = np.asarray(MAZE_MAPS["umaze"])
    assert maze.sum() == maze.size - 7  # U-maze has 7 free cells


def test_step_moves_toward_acceleration(env):
    state, _ = env.reset(jax.random.PRNGKey(1), batch_size=4)
    # zero action: position unchanged (v=0)
    s2, obs, r, d = env.step(state, jnp.zeros((4, 2)))
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(state.pos), atol=1e-6)
    # push +x from rest in open space: moves by vel_gain * pos_dt
    s3, *_ = env.step(state, jnp.tile(jnp.array([[1.0, 0.0]]), (4, 1)))
    moved = np.asarray(s3.pos[:, 0] - state.pos[:, 0])
    blocked = np.asarray(env._is_wall(state.pos + jnp.asarray([0.11, 0.0])))
    np.testing.assert_allclose(
        moved[~blocked], env.vel_gain * env.pos_dt, atol=1e-6
    )


def test_velocity_clipped(env):
    state, _ = env.reset(jax.random.PRNGKey(2), batch_size=1)
    # place in the open corridor and push hard many times
    state = state._replace(pos=jnp.array([[0.5, 1.0]]), vel=jnp.array([[4.99, 0.0]]))
    s, *_ = env.step(state, jnp.array([[1.0, 0.0]]))
    assert float(s.vel[0, 0]) <= 5.0 + 1e-6


def test_walls_block_motion(env):
    # U-maze top corridor is row 1 (y in (0.5, 1.5)), free for x in
    # (-1.5, 1.5); the border wall starts at x=1.5. Push hard right.
    state = PointMazeState(
        pos=jnp.array([[-1.0, 1.0]]),
        vel=jnp.array([[3.0, 0.0]]),
        goal=jnp.array([[1.0, -1.0]]),
        t=jnp.zeros((1,), jnp.int32),
        done=jnp.zeros((1,), bool),
    )
    assert not bool(env._is_wall(state.pos).any())  # start is free
    for _ in range(120):
        state, obs, r, d = env.step(state, jnp.array([[1.0, 0.0]]))
    # stopped at the border wall: center rests at face - radius + slack
    # (disc contact allows MuJoCo-like slack penetration, never more)
    assert float(state.pos[0, 0]) <= 1.5 - 0.1 + env.wall_slack + 1e-6
    assert float(state.pos[0, 0]) > 1.2  # actually travelled to the wall
    assert abs(float(state.vel[0, 0])) < 1e-6  # normal velocity removed


def test_sparse_and_dense_reward():
    env_s = PointMazeJax(reward_type="sparse")
    env_d = PointMazeJax(reward_type="dense")
    state, _ = env_s.reset(jax.random.PRNGKey(3), batch_size=1)
    at_goal = state._replace(pos=state.goal, vel=jnp.zeros((1, 2)))
    _, _, r_s, _ = env_s.step(at_goal, jnp.zeros((1, 2)))
    _, _, r_d, _ = env_d.step(at_goal, jnp.zeros((1, 2)))
    assert float(r_s[0]) == 1.0
    assert 0.9 < float(r_d[0]) <= 1.0


def test_disc_contact_slides_along_wall(env):
    # Press diagonally up-right against the U-maze top border (y face 1.5):
    # the y motion stops at the wall but x motion continues (tangential
    # velocity preserved — MuJoCo sphere/box sliding, unlike the old
    # axis-freeze which killed the pressed axis and often both).
    state = PointMazeState(
        pos=jnp.array([[-1.0, 1.38]]),
        vel=jnp.array([[0.0, 0.0]]),
        goal=jnp.array([[1.0, -1.0]]),
        t=jnp.zeros((1,), jnp.int32),
        done=jnp.zeros((1,), bool),
    )
    for _ in range(60):
        state, *_ = env.step(state, jnp.array([[1.0, 1.0]]))
    # slid right a substantial distance while pinned at the top wall
    assert float(state.pos[0, 0]) > -0.2
    assert float(state.pos[0, 1]) <= 1.5 - 0.1 + env.wall_slack + 1e-6
    assert float(state.vel[0, 0]) > 1.0  # tangential speed retained
    assert abs(float(state.vel[0, 1])) < 1e-5  # normal speed removed


def test_disc_contact_penetration_bounded(env):
    # Ram every free-space direction into walls for many steps; the disc
    # never sinks deeper than radius - slack into any wall box.
    rng = jax.random.PRNGKey(7)
    state, _ = env.reset(rng, batch_size=32)
    occ = np.asarray(env.maze)
    H, W = occ.shape
    for i in range(200):
        a = jax.random.uniform(
            jax.random.fold_in(rng, i), (32, 2), minval=-1.0, maxval=1.0
        )
        state, *_ = env.step(state, a)
    pos = np.asarray(state.pos)
    reach = 0.1 - env.wall_slack
    # distance from each agent to the nearest wall box must be >= reach
    for p in pos:
        best = np.inf
        for r in range(H):
            for c in range(W):
                if occ[r, c] != 1:
                    continue
                lo = np.array([c - W / 2.0, H / 2.0 - (r + 1)])
                q = np.clip(p, lo, lo + 1.0)
                best = min(best, float(np.linalg.norm(p - q)))
        assert best >= reach - 1e-5, (p, best)


def test_env_jit_and_vmap_compose(env):
    @jax.jit
    def run(rng):
        state, obs = env.reset(rng, batch_size=8)

        def body(s, _):
            s, o, r, d = env.step(s, jnp.ones((8, 2)) * 0.1)
            return s, r

        state, rewards = jax.lax.scan(body, state, None, length=20)
        return state.pos, rewards

    pos, rewards = run(jax.random.PRNGKey(4))
    assert pos.shape == (8, 2)
    assert rewards.shape == (20, 8)
    assert np.all(np.isfinite(np.asarray(pos)))


def test_ondevice_evaluator_runs(env):
    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=5
    )
    params = d.init_params(jax.random.PRNGKey(0))
    stats = NormStats.identity(6, 2)
    evaluator = make_ondevice_evaluator(
        d, env, action_horizon=4, n_replans=3
    )
    metrics, state = evaluator(params, jax.random.PRNGKey(1), stats, 16)
    assert metrics.success_rate.shape == ()
    assert 0.0 <= float(metrics.success_rate) <= 1.0
    assert np.isfinite(float(metrics.mean_reward))
    assert int(state.t[0]) == 12  # 3 replans x 4 steps


def test_ondevice_evaluator_megakernel_matches_shapes(env):
    """The megakernel replan path runs inside the fused loop (interpret
    mode on CPU) with projection + best-of-N and produces sane metrics."""
    from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
    from dadiff_tpu.dynamics.extractor import double_integrator_dynamics
    from dadiff_tpu.guides.sampling import ProjectionSpec

    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=5
    )
    params = d.init_params(jax.random.PRNGKey(0))
    stats = NormStats.identity(6, 2)
    A, B = double_integrator_dynamics(dt=0.1)
    sd, ad = 4, 2
    P = jnp.asarray(
        ProjectionMatrixBuilder(A, B, sd, ad).get_projection_matrix(8)
    )
    spec = ProjectionSpec(state_dim=sd)
    evaluator = make_ondevice_evaluator(
        d, env, action_horizon=4, n_replans=2, n_candidates=2,
        projection=spec, use_megakernel=True, P=P, stats=stats,
        mega_group_chains=4, mega_interpret=True,
    )
    metrics, state = evaluator(params, jax.random.PRNGKey(1), stats, 4, P)
    assert 0.0 <= float(metrics.success_rate) <= 1.0
    assert np.isfinite(float(metrics.mean_reward))
    assert int(state.t[0]) == 8


class _ScriptedEnv:
    """Tiny host-env stub for evaluate_policy protocol tests."""

    def __init__(self, n_steps=5):
        self.n_steps = n_steps

    def reset(self, seed=None):
        self.t = 0
        return {"observation": np.zeros(4), "desired_goal": np.ones(2)}, {}

    def step(self, action):
        self.t += 1
        done = self.t >= self.n_steps
        info = {"success": done}
        return (
            {"observation": np.zeros(4), "desired_goal": np.ones(2)},
            1.0,
            done,
            False,
            info,
        )


class _ConstPolicy:
    def get_action(self, obs):
        return np.zeros(2)

    def reset(self):
        pass


def test_evaluate_policy_protocol(tmp_path):
    metrics = evaluate_policy(_ConstPolicy(), _ScriptedEnv(), n_episodes=3, verbose=False)
    assert metrics["mean_reward"] == 5.0
    assert metrics["mean_length"] == 5.0
    assert metrics["success_rate"] == 1.0
    path = save_results(
        metrics, policy_type="guided", env_name="Stub-v0",
        results_dir=str(tmp_path), n_episodes=3,
    )
    import json

    with open(path) as f:
        results = json.load(f)
    assert results["metrics"]["success_rate"] == 1.0
    assert len(results["metrics"]["episode_rewards"]) == 3


def test_batched_vector_eval_smoke():
    """Batched lockstep evaluation over real gym envs with a tiny model."""
    from dadiff_tpu.datasets.normalization import DatasetNormalizer
    from dadiff_tpu.envs.vector_eval import evaluate_policy_batched
    from dadiff_tpu.guides.policies import MPCPolicy

    rng = np.random.RandomState(0)
    normalizer = DatasetNormalizer(rng.randn(200, 6), rng.randn(200, 2), 6, 2)
    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=5
    )
    params = d.init_params(jax.random.PRNGKey(0))
    policy = MPCPolicy(d, normalizer, params=params, action_horizon=4,
                       sampling_timesteps=5)

    metrics = evaluate_policy_batched(
        policy, "PointMaze_UMaze-v3", n_episodes=3, max_steps=12, seed=0,
        verbose=False, record_episodes=True,
    )
    assert len(metrics["episode_rewards"]) == 3
    assert metrics["mean_length"] == 12.0
    assert 0.0 <= metrics["success_rate"] <= 1.0

    # recorded episodes follow the npz schema: len(obs) = len(act)+1,
    # processed (goal-concat) observations, rewards aligned with actions
    eps = metrics["recorded_episodes"]
    assert len(eps) == 3
    for ep, length in zip(eps, metrics["episode_lengths"]):
        assert ep["observations"].shape == (length + 1, 6)
        assert ep["actions"].shape == (length, 2)
        assert ep["rewards"].shape == (length,)

    # round-trips through the dataset layer
    from dadiff_tpu.datasets.sources import load_episodes, save_episodes_npz
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "selfplay.npz")
        save_episodes_npz(path, eps)
        loaded = load_episodes("npz:" + path)
        assert len(loaded) == 3
        np.testing.assert_allclose(
            loaded[0]["observations"], eps[0]["observations"]
        )


def test_jax_env_tracks_real_env():
    """Calibrated PointMazeJax physics vs the real gymnasium PointMaze:
    same action sequence from the same state stays close over 20 steps
    (open corridor, no wall contact)."""
    gym = pytest.importorskip("gymnasium")
    try:
        import gymnasium_robotics  # noqa: F401
        real = gym.make("PointMaze_UMaze-v3")
    except Exception as e:
        pytest.skip(f"PointMaze unavailable: {e}")

    obs, _ = real.reset(seed=3)
    start = np.asarray(obs["observation"], np.float64)
    goal = np.asarray(obs["desired_goal"], np.float64)

    jenv = PointMazeJax(map_name="umaze")
    state = PointMazeState(
        pos=jnp.asarray(start[:2])[None],
        vel=jnp.asarray(start[2:4])[None],
        goal=jnp.asarray(goal)[None],
        t=jnp.zeros((1,), jnp.int32),
        done=jnp.zeros((1,), bool),
    )

    rng = np.random.RandomState(0)
    max_err = 0.0
    for _ in range(20):
        a = rng.uniform(-0.3, 0.3, 2).astype(np.float32)
        obs, *_ = real.step(a)
        state, jobs, _, _ = jenv.step(state, jnp.asarray(a)[None])
        err = float(np.linalg.norm(
            np.asarray(obs["observation"][:2]) - np.asarray(state.pos[0])
        ))
        max_err = max(max_err, err)
    real.close()
    # sysID-calibrated physics: positions stay within ~5cm over 20 steps
    assert max_err < 0.05, f"divergence {max_err:.4f}"


def test_ondevice_evaluator_best_of_n(env):
    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=5
    )
    params = d.init_params(jax.random.PRNGKey(0))
    stats = NormStats.identity(6, 2)
    evaluator = make_ondevice_evaluator(
        d, env, action_horizon=4, n_replans=2, n_candidates=4
    )
    metrics, state = evaluator(params, jax.random.PRNGKey(1), stats, 8)
    assert 0.0 <= float(metrics.success_rate) <= 1.0
    assert np.isfinite(float(metrics.mean_reward))
    assert int(state.t[0]) == 8


def test_batched_vector_eval_track_planned_states():
    """--batched + --action-source track: one batched inverse-dynamics call
    per lockstep step, fed the OBSERVED states (closed-loop), actions steer
    toward the planned next state."""
    from dadiff_tpu.datasets.normalization import DatasetNormalizer
    from dadiff_tpu.envs.vector_eval import evaluate_policy_batched
    from dadiff_tpu.guides.policies import MPCPolicy

    rng = np.random.RandomState(0)
    normalizer = DatasetNormalizer(rng.randn(200, 6), rng.randn(200, 2), 6, 2)
    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=5
    )
    params = d.init_params(jax.random.PRNGKey(0))

    seen = []

    def linear_inverse(o, nxt):
        seen.append(np.asarray(o))
        return jnp.clip(
            jnp.asarray(nxt)[:, :2] - jnp.asarray(o)[:, :2], -1.0, 1.0
        )

    policy = MPCPolicy(d, normalizer, params=params, action_horizon=4,
                       sampling_timesteps=5,
                       inverse_dynamics=linear_inverse,
                       track_planned_states=True)

    n_eps, n_steps = 3, 8
    metrics = evaluate_policy_batched(
        policy, "PointMaze_UMaze-v3", n_episodes=n_eps, max_steps=n_steps,
        seed=0, verbose=False,
    )
    assert len(metrics["episode_rewards"]) == n_eps
    assert metrics["mean_length"] == float(n_steps)
    # one batched call per executed step, each over all envs' OBSERVED states
    assert len(seen) == n_steps
    for s in seen:
        assert s.shape == (n_eps, 6)
    # consecutive steps see different observed states (closed-loop feedback)
    assert not np.allclose(seen[0], seen[1])
