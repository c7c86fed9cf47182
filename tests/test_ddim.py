"""DDIM fast-sampling tests (new capability vs the reference's unsafe
truncation, evaluate.py:352)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.fixture(scope="module")
def d():
    unet = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2))
    return GaussianDiffusion(
        model=unet, horizon=8, observation_dim=3, action_dim=2, n_timesteps=50
    )


@pytest.fixture(scope="module")
def params(d, rng):
    return d.init_params(rng)


def test_ddim_shapes_and_determinism(d, params):
    out1 = d.ddim_sample_loop(params, jax.random.PRNGKey(0), (2, 8, 5),
                              sampling_timesteps=10)
    out2 = d.ddim_sample_loop(params, jax.random.PRNGKey(0), (2, 8, 5),
                              sampling_timesteps=10)
    assert out1.shape == (2, 8, 5)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.all(np.isfinite(np.asarray(out1)))


def test_ddim_eta0_ignores_noise_rng(d, params):
    """Deterministic DDIM: same init noise => same output regardless of the
    per-step noise stream."""
    init = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 5))
    out_a = d.ddim_sample_loop(params, jax.random.PRNGKey(1), (1, 8, 5),
                               sampling_timesteps=10, eta=0.0, init_noise=init)
    out_b = d.ddim_sample_loop(params, jax.random.PRNGKey(2), (1, 8, 5),
                               sampling_timesteps=10, eta=0.0, init_noise=init)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_ddim_eta1_uses_noise(d, params):
    init = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 5))
    out_a = d.ddim_sample_loop(params, jax.random.PRNGKey(1), (1, 8, 5),
                               sampling_timesteps=10, eta=1.0, init_noise=init)
    out_b = d.ddim_sample_loop(params, jax.random.PRNGKey(2), (1, 8, 5),
                               sampling_timesteps=10, eta=1.0, init_noise=init)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_ddim_full_chain_eta1_close_to_ddpm_statistics(d, params):
    """With S == n_timesteps and eta=1, DDIM marginal statistics track the
    ancestral sampler's (loose statistical check)."""
    n = 64
    ddim = d.ddim_sample_loop(params, jax.random.PRNGKey(3), (n, 8, 5),
                              sampling_timesteps=50, eta=1.0)
    ddpm = d.p_sample_loop(params, jax.random.PRNGKey(4), (n, 8, 5))
    m1, m2 = float(jnp.mean(ddim)), float(jnp.mean(ddpm))
    s1, s2 = float(jnp.std(ddim)), float(jnp.std(ddpm))
    assert abs(m1 - m2) < 0.2
    assert abs(s1 - s2) < 0.25


def test_ddim_rejects_oversampling(d, params):
    with pytest.raises(ValueError):
        d.ddim_sample_loop(params, jax.random.PRNGKey(0), (1, 8, 5),
                           sampling_timesteps=51)
