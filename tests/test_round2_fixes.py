"""Round-2 hardening tests: reset semantics, state injection, loud failures,
config precedence, normalizer persistence (VERDICT.md / ADVICE.md items)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.datasets.normalization import DatasetNormalizer
from dadiff_tpu.envs.pointmaze_jax import GOAL_THRESHOLD, PointMazeJax
from dadiff_tpu.guides.policies import DynamicsAwarePolicy


# ---------------------------------------------------------------------------
# PointMazeJax.reset: no trivially-successful episodes (ADVICE medium)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("map_name", ["umaze", "medium", "large"])
def test_reset_never_starts_inside_goal_threshold(map_name):
    env = PointMazeJax(map_name=map_name)
    state, _ = env.reset(jax.random.PRNGKey(0), batch_size=4096)
    dist = np.linalg.norm(np.asarray(state.pos - state.goal), axis=-1)
    # gymnasium-robotics rejects reset positions within 0.5 of the goal;
    # distinct cells + noise give >= 0.5 > the 0.45 success threshold
    assert dist.min() > GOAL_THRESHOLD, (
        f"{map_name}: trivial-success reset at distance {dist.min():.3f}"
    )


def test_reset_goal_distribution_still_uniformish():
    # distinct-cell sampling must not collapse goal diversity
    env = PointMazeJax(map_name="umaze")
    state, _ = env.reset(jax.random.PRNGKey(1), batch_size=4096)
    goals = np.asarray(state.goal)
    # umaze has 7 free cells; every cell should be hit as a goal
    cells = {tuple(np.round(g).astype(int)) for g in goals}
    assert len(cells) >= 6


# ---------------------------------------------------------------------------
# DynamicsAwarePolicy: loud failure on missing projection inputs (VERDICT #7)
# ---------------------------------------------------------------------------

def _tiny_diffusion():
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    return GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=5
    )


def _dummy_normalizer(d):
    from dadiff_tpu.datasets.normalization import DatasetNormalizer

    return DatasetNormalizer.from_arrays(
        {
            "obs_mean": np.zeros(d.observation_dim, np.float32),
            "obs_std": np.ones(d.observation_dim, np.float32),
            "action_mean": np.zeros(d.action_dim, np.float32),
            "action_std": np.ones(d.action_dim, np.float32),
        }
    )


def test_dynamics_aware_raises_without_projection():
    d = _tiny_diffusion()
    with pytest.raises(ValueError, match="projection_matrix"):
        DynamicsAwarePolicy(
            d, projection_matrix=None, normalizer=_dummy_normalizer(d)
        )


def test_dynamics_aware_requires_normalizer_even_in_parity_mode():
    """A missing normalizer used to construct fine under parity_mode and
    crash on first get_action (GuidedPolicy.plan normalizes)."""
    d = _tiny_diffusion()
    with pytest.raises(ValueError, match="normalizer"):
        DynamicsAwarePolicy(d, projection_matrix=None, normalizer=None,
                            parity_mode=True)


def test_dynamics_aware_parity_mode_allows_missing_projection():
    d = _tiny_diffusion()
    policy = DynamicsAwarePolicy(
        d, projection_matrix=None, normalizer=_dummy_normalizer(d),
        parity_mode=True,
    )
    assert policy._P is None


# ---------------------------------------------------------------------------
# NumericalDynamicsExtractor: model-derived qpos/qvel layout (VERDICT #5)
# ---------------------------------------------------------------------------

def test_qpos_qvel_layout_odd_state():
    class FakeModel:
        nq, nv = 6, 6

    class FakeExtractor:
        from dadiff_tpu.dynamics.extractor import NumericalDynamicsExtractor

        _qpos_qvel_layout = NumericalDynamicsExtractor._qpos_qvel_layout
        state_dim = 11  # Hopper: root x excluded from obs
        env_name = "Hopper-v5"

    nq, nv, excluded = FakeExtractor()._qpos_qvel_layout(FakeModel())
    assert (nq, nv, excluded) == (6, 6, 1)


@pytest.mark.slow
def test_numerical_extractor_matches_true_maze_physics():
    gym = pytest.importorskip("gymnasium")
    pytest.importorskip("gymnasium_robotics")
    from dadiff_tpu.dynamics.extractor import NumericalDynamicsExtractor

    ex = NumericalDynamicsExtractor("PointMaze_UMaze-v3")
    A, B = ex.get_dynamics(linearization_point=np.array([1.0, 1.0, 0.0, 0.0]))
    ex.close()
    # Double-integrator structure with the env's true constants (the same
    # constants the sysID fit recovers: pos gain ~0.01, vel decay ~0.99,
    # action gain ~0.23 — envs/pointmaze_jax.py defaults).
    assert np.allclose(A[:2, :2], np.eye(2), atol=1e-3)
    assert np.allclose(A[:2, 2:], 0.01 * np.eye(2), atol=2e-3)
    assert np.allclose(A[2:, :2], 0.0, atol=1e-3)
    vel_decay = np.diag(A[2:, 2:])
    assert np.all((vel_decay > 0.95) & (vel_decay <= 1.001))
    act_gain = np.diag(B[2:, :])
    assert np.all((act_gain > 0.15) & (act_gain < 0.35))


@pytest.mark.slow
def test_numerical_extractor_hopper_injection():
    gym = pytest.importorskip("gymnasium")
    from dadiff_tpu.dynamics.extractor import NumericalDynamicsExtractor

    ex = NumericalDynamicsExtractor("Hopper-v5")  # state_dim 11, nq=6, nv=6
    assert ex.state_dim == 11
    obs, _ = ex.env.reset(seed=0)
    A, B = ex.get_dynamics(linearization_point=ex._extract_state(obs))
    ex.close()
    assert A.shape == (11, 11) and B.shape == (11, 3)
    assert np.isfinite(A).all() and np.isfinite(B).all()
    # position coords carry themselves forward (diag ~1 on qpos block)
    assert np.all(np.abs(np.diag(A)[:5] - 1.0) < 0.2)


# ---------------------------------------------------------------------------
# Config precedence: explicit CLI flags beat config even at default values
# (ADVICE low)
# ---------------------------------------------------------------------------

def test_explicit_flag_equal_to_default_beats_config():
    from dadiff_tpu.cli import build_train_parser
    from dadiff_tpu.utils.config import apply_config_defaults

    parser = build_train_parser()
    argv = ["--dim", "128"]  # 128 IS the parser default
    args = parser.parse_args(argv)
    apply_config_defaults(args, {"dim": 64, "horizon": 48}, parser, argv=argv)
    assert args.dim == 128  # explicit flag wins over config
    assert args.horizon == 48  # unpassed flag takes the config value


def test_equals_form_flag_detected():
    from dadiff_tpu.cli import build_train_parser
    from dadiff_tpu.utils.config import apply_config_defaults

    parser = build_train_parser()
    argv = ["--dim=128"]
    args = parser.parse_args(argv)
    apply_config_defaults(args, {"dim": 64}, parser, argv=argv)
    assert args.dim == 128


# ---------------------------------------------------------------------------
# Normalizer persistence round-trip (ADVICE low)
# ---------------------------------------------------------------------------

def test_normalizer_from_arrays_roundtrip():
    obs = np.random.RandomState(0).randn(100, 6).astype(np.float32)
    act = np.random.RandomState(1).randn(100, 2).astype(np.float32)
    norm = DatasetNormalizer(obs, act, 6, 2, normalizer="LimitsNormalizer")
    stats = {k: v.tolist() for k, v in norm.as_arrays().items()}  # json trip
    rebuilt = DatasetNormalizer.from_arrays(
        {k: np.asarray(v, np.float32) for k, v in stats.items()}
    )
    x = np.random.RandomState(2).randn(5, 6).astype(np.float32)
    np.testing.assert_allclose(
        rebuilt.normalize_observations(x), norm.normalize_observations(x),
        rtol=1e-6,
    )
    a = np.random.RandomState(3).randn(5, 2).astype(np.float32)
    np.testing.assert_allclose(
        rebuilt.unnormalize_actions(a), norm.unnormalize_actions(a), rtol=1e-6
    )
    assert rebuilt.observation_dim == 6 and rebuilt.action_dim == 2


def test_trainer_config_carries_normalizer_stats():
    from dadiff_tpu.utils.training import Trainer

    obs = np.random.RandomState(0).randn(50, 6).astype(np.float32)
    act = np.random.RandomState(1).randn(50, 2).astype(np.float32)
    norm = DatasetNormalizer(obs, act, 6, 2)

    d = _tiny_diffusion()

    def loss_fn(params, batch, rng):
        return jnp.asarray(0.0), {"total": jnp.asarray(0.0)}

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        tr = Trainer(d, [], loss_fn, log_dir=td, normalizer=norm,
                     export_pt=False)
        cfg = tr._config_dict()
        tr.close()
    assert "normalizer_stats" in cfg
    rebuilt = DatasetNormalizer.from_arrays(
        {k: np.asarray(v, np.float32)
         for k, v in cfg["normalizer_stats"].items()}
    )
    np.testing.assert_allclose(rebuilt.obs_mean, norm.obs_mean, rtol=1e-6)
