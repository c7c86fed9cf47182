"""Data layer tests (implied interface from reference train.py:370-386,
evaluate.py:165-171; normalizer semantics from policies.py:334-337)."""

import numpy as np
import pytest

from dadiff_tpu.datasets.normalization import (
    DatasetNormalizer,
    GaussianNormalizer,
    LimitsNormalizer,
)
from dadiff_tpu.datasets.sequence import SequenceDataset, create_dataloader, prefetch_to_device
from dadiff_tpu.datasets import sources


def test_gaussian_normalizer_roundtrip():
    data = np.random.randn(500, 3) * 5 + 2
    n = GaussianNormalizer(data)
    z = n.normalize(data)
    np.testing.assert_allclose(z.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(z.std(axis=0), 1, atol=1e-4)
    np.testing.assert_allclose(n.unnormalize(z), data, rtol=1e-4, atol=1e-4)


def test_limits_normalizer_maps_to_unit_box():
    data = np.random.rand(200, 4) * 10 - 3
    n = LimitsNormalizer(data)
    z = n.normalize(data)
    assert z.min() >= -1 - 1e-6 and z.max() <= 1 + 1e-6
    np.testing.assert_allclose(z.min(axis=0), -1, atol=1e-6)
    np.testing.assert_allclose(z.max(axis=0), 1, atol=1e-6)
    np.testing.assert_allclose(n.unnormalize(z), data, rtol=1e-4, atol=1e-4)


def test_dataset_normalizer_reference_attrs():
    obs = np.random.randn(100, 6)
    act = np.random.randn(100, 2)
    n = DatasetNormalizer(obs, act, 6, 2, normalizer="GaussianNormalizer")
    # attributes consumed by the projection code
    assert n.obs_mean.shape == (6,) and n.obs_std.shape == (6,)
    assert n.action_mean.shape == (2,) and n.action_std.shape == (2,)
    x = np.random.randn(5, 6)
    np.testing.assert_allclose(
        n.normalize_observations(x), (x - n.obs_mean) / n.obs_std, rtol=1e-5
    )
    traj = np.random.randn(3, 7, 8).astype(np.float32)
    np.testing.assert_allclose(
        n.unnormalize_trajectory(n.normalize_trajectory(traj)), traj, rtol=1e-3, atol=1e-4
    )


def test_synthetic_episodes_satisfy_double_integrator():
    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=3, episode_len=20)
    dt = 0.1
    A = np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]])
    B = np.array([[0.5 * dt**2, 0], [0, 0.5 * dt**2], [dt, 0], [0, dt]])
    for ep in eps:
        s = ep["observations"][:, :4]
        u = ep["actions"]
        pred = s[:-1] @ A.T + u @ B.T
        np.testing.assert_allclose(pred, s[1:], rtol=1e-4, atol=1e-5)
        # goal constant within episode
        assert np.ptp(ep["observations"][:, 4:], axis=0).max() == 0


def test_sequence_dataset_windows_and_shapes():
    ds = SequenceDataset("synthetic:pointmaze:n=4,T=40", horizon=16)
    assert ds.observation_dim == 6 and ds.action_dim == 2 and ds.transition_dim == 8
    assert len(ds) == 4 * (40 - 16 + 1)
    item = ds[0]
    assert item["conditions"].shape == (16, 8)
    assert item["conditions"].dtype == np.float32
    batch = ds.get_batch(np.array([0, 5, 10]))
    assert batch["conditions"].shape == (3, 16, 8)
    np.testing.assert_array_equal(batch["conditions"][0], ds[0]["conditions"])


def test_sequence_dataset_padding():
    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=2, episode_len=5)
    ds = SequenceDataset(episodes=eps, horizon=16, use_padding=True)
    assert len(ds) == 2  # one padded window each
    w = ds[0]["conditions"]
    assert w.shape == (16, 8)
    # padded tail repeats the last real row
    np.testing.assert_array_equal(w[5], w[15])

    with pytest.raises(ValueError):
        SequenceDataset(episodes=eps, horizon=16, use_padding=False)


def test_window_boundaries_do_not_cross_episodes():
    """Windows must never span two episodes in the packed arena."""
    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=2, episode_len=20, seed=3)
    # make the two goals differ so cross-episode windows would show a goal jump
    ds = SequenceDataset(episodes=eps, horizon=8)
    for idx in range(len(ds)):
        w = ds[idx]["conditions"]
        goal_cols = w[:, 4:6]
        assert np.ptp(goal_cols, axis=0).max() < 1e-6, f"window {idx} crosses episodes"


def test_dataloader_epoch():
    ds = SequenceDataset("synthetic:pointmaze:n=4,T=40", horizon=16)
    dl = create_dataloader(ds, batch_size=25, shuffle=True, seed=1)
    batches = list(dl)
    assert len(batches) == len(dl) == len(ds) // 25
    for b in batches:
        assert b["conditions"].shape == (25, 16, 8)
    # different epoch order when shuffling
    b2 = next(iter(dl))
    assert not np.array_equal(batches[0]["conditions"], b2["conditions"])


def test_prefetch_to_device():
    import jax

    ds = SequenceDataset("synthetic:pointmaze:n=2,T=30", horizon=8)
    dl = create_dataloader(ds, batch_size=8, shuffle=False)
    n = 0
    for batch in prefetch_to_device(iter(dl), size=2):
        assert isinstance(batch["conditions"], jax.Array)
        n += 1
    assert n == len(dl)


def test_npz_roundtrip(tmp_path):
    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=3, episode_len=10)
    path = str(tmp_path / "eps.npz")
    sources.save_episodes_npz(path, eps)
    back = sources.load_episodes_npz(path)
    assert len(back) == 3
    np.testing.assert_array_equal(back[1]["observations"], eps[1]["observations"])
    # and through the dispatcher
    ds = SequenceDataset(f"npz:{path}", horizon=8)
    assert len(ds) > 0


def test_mixed_spec_concatenates(tmp_path):
    a = sources.generate_synthetic_episodes("pointmaze", n_episodes=2, episode_len=10)
    b = sources.generate_synthetic_episodes("pointmaze", n_episodes=3, episode_len=10)
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    sources.save_episodes_npz(pa, a)
    sources.save_episodes_npz(pb, b)
    mixed = sources.load_episodes(f"npz:{pa}+npz:{pb}")
    assert len(mixed) == 5
    np.testing.assert_array_equal(mixed[0]["observations"], a[0]["observations"])
    np.testing.assert_array_equal(mixed[2]["observations"], b[0]["observations"])
    # end-to-end through the dataset layer
    ds = SequenceDataset(f"npz:{pa}+npz:{pb}", horizon=8)
    assert len(ds) > 0


def test_flatten_observation_dict_variants():
    obs = {"observation": np.arange(4.0), "desired_goal": np.array([9.0, 9.0])}
    np.testing.assert_array_equal(
        sources.flatten_observation(obs), np.array([0, 1, 2, 3, 9, 9], np.float32)
    )
    np.testing.assert_array_equal(
        sources.flatten_observation(obs, include_goal=False),
        np.array([0, 1, 2, 3], np.float32),
    )
    np.testing.assert_array_equal(
        sources.flatten_observation(np.array([1.0, 2.0])), np.array([1, 2], np.float32)
    )


def test_set_normalizer_renormalizes_arena():
    """Swapping in stored stats keeps windows consistent: arena values under
    the new normalizer unnormalize to the same physical data."""
    from dadiff_tpu.datasets.normalization import DatasetNormalizer
    from dadiff_tpu.datasets.sequence import SequenceDataset

    ds = SequenceDataset(dataset_name="synthetic:pointmaze:n=4,T=40", horizon=8)
    phys_before = ds.normalizer.unnormalize_trajectory(ds._arena).copy()
    obs_dim, act_dim = ds.observation_dim, ds.action_dim
    stored = DatasetNormalizer.from_arrays(
        {
            "obs_mean": np.full(obs_dim, 0.5, np.float32),
            "obs_std": np.full(obs_dim, 2.0, np.float32),
            "action_mean": np.zeros(act_dim, np.float32),
            "action_std": np.full(act_dim, 3.0, np.float32),
        }
    )
    ds.set_normalizer(stored)
    phys_after = ds.normalizer.unnormalize_trajectory(ds._arena)
    np.testing.assert_allclose(phys_after, phys_before, atol=1e-4)
    # and the arena really is scaled by the new stats now
    w = ds[0]["conditions"]
    assert np.isfinite(w).all()


def test_constant_feature_uses_unit_scale():
    """A zero-range feature gets scale 1.0 (with a warning), not 1e-8 —
    eval-time deviations in that feature would otherwise blow up ~1e8x."""
    import warnings
    from dadiff_tpu.datasets.normalization import LimitsNormalizer

    data = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    data[:, 1] = 7.0  # constant column
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        norm = LimitsNormalizer(data)
    assert any("constant feature" in str(x.message) for x in w)
    assert norm.std[1] == 1.0
    out = norm.normalize(np.array([[0.0, 7.1, 0.0]], np.float32))
    assert abs(out[0, 1]) < 1.0  # small deviation stays small
