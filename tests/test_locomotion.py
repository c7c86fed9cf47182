"""Locomotion env family (Box observations) end-to-end smoke tests —
BASELINE.json configs[2,3] model families (HalfCheetah / Adroit-scale nets).
Data collection uses short random rollouts (no minari in this image)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.datasets.sequence import SequenceDataset
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.fixture(scope="module")
def cheetah_episodes():
    gym = pytest.importorskip("gymnasium")
    from dadiff_tpu.datasets.sources import collect_gym_episodes

    try:
        return collect_gym_episodes("HalfCheetah-v5", n_episodes=2, max_steps=40,
                                    seed=0)
    except Exception as e:  # mujoco missing/unbuildable in some images
        pytest.skip(f"HalfCheetah unavailable: {e}")


def test_box_observation_pipeline(cheetah_episodes):
    eps = cheetah_episodes
    assert eps[0]["observations"].shape[-1] == 17
    assert eps[0]["actions"].shape[-1] == 6
    ds = SequenceDataset(episodes=eps, horizon=16)
    assert ds.observation_dim == 17 and ds.action_dim == 6
    batch = ds.get_batch(np.arange(4))
    assert batch["conditions"].shape == (4, 16, 23)


def test_halfcheetah_model_config_trains(cheetah_episodes, rng):
    """BASELINE configs[2] shape (downscaled dims): mults 1-4-8."""
    ds = SequenceDataset(episodes=cheetah_episodes, horizon=16)
    unet = TemporalUnet(transition_dim=23, dim=8, dim_mults=(1, 4, 8))
    d = GaussianDiffusion(
        model=unet, horizon=16, observation_dim=17, action_dim=6, n_timesteps=10
    )
    params = d.init_params(rng)
    batch = jnp.asarray(ds.get_batch(np.arange(8))["conditions"])
    loss = d.loss(params, rng, batch)
    assert np.isfinite(float(loss))


def test_adroit_scale_unet_four_levels(rng):
    """BASELINE configs[3]: largest family, mults (1,2,4,8); Adroit door dims
    obs=39, act=28 (hardware-independent shape check)."""
    unet = TemporalUnet(transition_dim=67, dim=8, dim_mults=(1, 2, 4, 8))
    d = GaussianDiffusion(
        model=unet, horizon=32, observation_dim=39, action_dim=28, n_timesteps=10
    )
    params = d.init_params(rng)
    x = jax.random.normal(rng, (2, 32, 67))
    out = d.apply(params, x, jnp.zeros((2,), jnp.int32))
    assert out.shape == x.shape
