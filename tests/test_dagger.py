"""DAgger-style relabeling (envs/mppi_tpu.py::dagger_relabel_episodes).

Start-state subsampling is pure numpy; the relabel loop itself needs a real
MuJoCo env and runs as a gated smoke test with a tiny planner/simulator.
"""

import numpy as np
import pytest

from dadiff_tpu.envs.mppi_tpu import dagger_segment_starts


def _fake_episodes(n_eps=3, length=120, dim=17, seed=0):
    rng = np.random.RandomState(seed)
    return [
        {
            "observations": rng.randn(length + 1, dim).astype(np.float32),
            "actions": rng.randn(length, 6).astype(np.float32),
            "rewards": rng.randn(length).astype(np.float32),
        }
        for _ in range(n_eps)
    ]


def test_segment_starts_stride_and_skip():
    eps = _fake_episodes(n_eps=2, length=100)
    starts = dagger_segment_starts(
        eps, stride=25, skip_initial=10, max_segments=100
    )
    # per episode: indices 10, 35, 60, 85 -> 4 starts x 2 episodes
    assert starts.shape == (8, 17)
    np.testing.assert_array_equal(starts[0], eps[0]["observations"][10])
    np.testing.assert_array_equal(starts[1], eps[0]["observations"][35])


def test_segment_starts_subsample_cap():
    eps = _fake_episodes(n_eps=4, length=200)
    starts = dagger_segment_starts(
        eps, stride=5, skip_initial=0, max_segments=30, seed=1
    )
    assert starts.shape == (30, 17)
    # deterministic for a fixed seed
    again = dagger_segment_starts(
        eps, stride=5, skip_initial=0, max_segments=30, seed=1
    )
    np.testing.assert_array_equal(starts, again)


def test_segment_starts_empty_raises():
    eps = [
        {
            "observations": np.zeros((3, 17), np.float32),
            "actions": np.zeros((2, 6), np.float32),
            "rewards": np.zeros(2, np.float32),
        }
    ]
    with pytest.raises(ValueError, match="no visited states"):
        dagger_segment_starts(eps, stride=25, skip_initial=10)


def test_inject_state_roundtrip():
    gym = pytest.importorskip("gymnasium")
    try:
        env = gym.make("HalfCheetah-v5")
    except Exception:
        pytest.skip("HalfCheetah-v5 unavailable")
    from dadiff_tpu.envs.mppi_tpu import _inject_state

    env.reset(seed=0)
    target = np.arange(17, dtype=np.float32) * 0.01
    obs = _inject_state(env, target)
    np.testing.assert_allclose(obs, target, atol=1e-6)
    # the simulator really holds the injected state: qpos[1:] + qvel
    unwrapped = env.unwrapped
    np.testing.assert_allclose(unwrapped.data.qpos[1:], target[:8], atol=1e-6)
    np.testing.assert_allclose(unwrapped.data.qvel, target[8:], atol=1e-6)
    env.close()


def test_dagger_relabel_smoke():
    gym = pytest.importorskip("gymnasium")
    try:
        env = gym.make("HalfCheetah-v5")
        env.close()
    except Exception:
        pytest.skip("HalfCheetah-v5 unavailable")
    from dadiff_tpu.envs.mppi_tpu import dagger_relabel_episodes

    rng = np.random.RandomState(0)
    # visited rollouts: short random HalfCheetah episodes (real env so the
    # injected states are physical)
    env = gym.make("HalfCheetah-v5")
    visited = []
    for i in range(2):
        o, _ = env.reset(seed=100 + i)
        buf = {"obs": [np.asarray(o, np.float32)], "act": [], "rew": []}
        for _ in range(40):
            a = rng.uniform(-1, 1, 6).astype(np.float32)
            o, r, *_ = env.step(a)
            buf["obs"].append(np.asarray(o, np.float32))
            buf["act"].append(a)
            buf["rew"].append(float(r))
        visited.append(
            {
                "observations": np.stack(buf["obs"]),
                "actions": np.stack(buf["act"]),
                "rewards": np.asarray(buf["rew"], np.float32),
            }
        )
    env.close()

    segments = dagger_relabel_episodes(
        "HalfCheetah-v5",
        visited,
        visited,  # tiny pool: the visited rollouts themselves
        segment_len=6,
        stride=15,
        skip_initial=5,
        max_segments=4,
        batch_envs=2,
        horizon=4,
        n_samples=8,
        n_exec=2,
        sim_hidden=(32,),
        sim_steps=30,
        sim_ensemble=1,
        seed=0,
        verbose=False,
    )
    assert len(segments) == 4
    for seg in segments:
        assert seg["observations"].shape == (7, 17)
        assert seg["actions"].shape == (6, 6)
        assert seg["rewards"].shape == (6,)
        assert np.all(np.isfinite(seg["observations"]))
    # segments start (approximately) at the requested visited states:
    # first obs equals an injected visited state
    starts = dagger_segment_starts(
        visited, stride=15, skip_initial=5, max_segments=4, seed=0
    )
    np.testing.assert_allclose(segments[0]["observations"][0], starts[0],
                               atol=1e-5)
