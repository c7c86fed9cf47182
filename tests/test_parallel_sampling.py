"""Picard-parallel sampling tests: exactness at convergence + sweep savings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.parallel_sampling import parallel_sample_loop
from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.fixture(scope="module")
def setup(rng):
    unet = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=3, action_dim=2, n_timesteps=20
    )
    params = d.init_params(rng)
    return d, params


def test_parallel_matches_sequential(setup, rng):
    d, params = setup
    shape = (2, 8, 5)
    init = jax.random.normal(jax.random.PRNGKey(1), shape)
    noise = jax.random.normal(jax.random.PRNGKey(2), (20,) + shape)

    seq = d.p_sample_loop(params, rng, shape, init_noise=init, step_noise=noise)
    par, sweeps = parallel_sample_loop(
        d.apply, params, d.schedule, rng, shape,
        init_noise=init, step_noise=noise, tol=1e-6, return_sweeps=True,
    )
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq), rtol=1e-3, atol=1e-3)
    assert int(sweeps) <= 20


def test_parallel_converges_in_fewer_sweeps(setup, rng):
    """At practical tolerance the fixed point needs fewer sweeps than T."""
    d, params = setup
    shape = (1, 8, 5)
    _, sweeps = parallel_sample_loop(
        d.apply, params, d.schedule, jax.random.PRNGKey(3), shape,
        tol=1e-2, return_sweeps=True,
    )
    assert int(sweeps) < 20, f"no parallel speedup: {int(sweeps)} sweeps for T=20"


def test_parallel_accuracy_at_practical_tol(setup, rng):
    d, params = setup
    shape = (1, 8, 5)
    init = jax.random.normal(jax.random.PRNGKey(4), shape)
    noise = jax.random.normal(jax.random.PRNGKey(5), (20,) + shape)
    seq = d.p_sample_loop(params, rng, shape, init_noise=init, step_noise=noise)
    par = parallel_sample_loop(
        d.apply, params, d.schedule, rng, shape,
        init_noise=init, step_noise=noise, tol=1e-3,
    )
    # practical tolerance: close but not bit-identical
    assert float(jnp.max(jnp.abs(par - seq))) < 0.05
