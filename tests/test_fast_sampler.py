"""fast_p_sample_loop equivalence tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.fast_sampler import fast_p_sample_loop
from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.fixture(scope="module")
def setup(rng):
    unet = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=3, action_dim=2, n_timesteps=20
    )
    return d, d.init_params(rng)


def test_fast_matches_standard(setup, rng):
    d, params = setup
    shape = (2, 8, 5)
    init = jax.random.normal(jax.random.PRNGKey(1), shape)
    noise = jax.random.normal(jax.random.PRNGKey(2), (20,) + shape)
    ref = d.p_sample_loop(params, rng, shape, init_noise=init, step_noise=noise)
    fast = fast_p_sample_loop(
        d.model, params, d.schedule, rng, shape,
        init_noise=init, step_noise=noise,
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_fast_truncation(setup, rng):
    d, params = setup
    out = fast_p_sample_loop(
        d.model, params, d.schedule, rng, (1, 8, 5), sampling_timesteps=5
    )
    assert out.shape == (1, 8, 5)
    assert np.all(np.isfinite(np.asarray(out)))
