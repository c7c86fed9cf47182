"""Picard-parallel sampling tests: exactness at convergence + sweep savings.

Sweep savings require a smooth (trained-like) denoiser — Picard iteration
contracts when eps(x, t) is Lipschitz-gentle, which random-weight nets are
not. Exactness is model-independent; the speedup test uses an analytic
denoiser.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion, p_sample_loop
from dadiff_tpu.models.parallel_sampling import parallel_sample_loop
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.schedules import make_schedule


@pytest.fixture(scope="module")
def setup(rng):
    unet = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=3, action_dim=2, n_timesteps=20
    )
    params = d.init_params(rng)
    return d, params


def test_parallel_matches_sequential_exactly(setup, rng):
    """Tight tolerance: identical to the sequential chain (any model)."""
    d, params = setup
    shape = (2, 8, 5)
    init = jax.random.normal(jax.random.PRNGKey(1), shape)
    noise = jax.random.normal(jax.random.PRNGKey(2), (20,) + shape)

    seq = d.p_sample_loop(params, rng, shape, init_noise=init, step_noise=noise)
    par, sweeps = parallel_sample_loop(
        d.apply, params, d.schedule, rng, shape,
        init_noise=init, step_noise=noise, tol=1e-6, return_sweeps=True,
    )
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq), rtol=1e-4, atol=1e-4)
    assert int(sweeps) <= 2 * 20  # exactness backstop


def test_parallel_speedup_with_smooth_model(rng):
    """An analytic (smooth) denoiser converges in far fewer sweeps than T —
    the regime trained models live in (ParaDiGMS, arXiv:2305.16317)."""
    schedule = make_schedule(50, "cosine")
    shape = (1, 8, 5)

    def apply_fn(params, x, t):  # smooth eps-prediction: shrink toward 0
        return 0.1 * x

    init = jax.random.normal(jax.random.PRNGKey(1), shape)
    noise = jax.random.normal(jax.random.PRNGKey(2), (50,) + shape)

    seq = p_sample_loop(apply_fn, None, schedule, jax.random.PRNGKey(0), shape,
                        init_noise=init, step_noise=noise)
    par, sweeps = parallel_sample_loop(
        apply_fn, None, schedule, jax.random.PRNGKey(0), shape,
        init_noise=init, step_noise=noise, tol=1e-3, window=25,
        return_sweeps=True,
    )
    assert int(sweeps) < 50, f"no parallel speedup: {int(sweeps)} sweeps for T=50"
    assert float(jnp.max(jnp.abs(par - seq))) < 0.05


def test_parallel_accuracy_at_practical_tol(setup, rng):
    d, params = setup
    shape = (1, 8, 5)
    init = jax.random.normal(jax.random.PRNGKey(4), shape)
    noise = jax.random.normal(jax.random.PRNGKey(5), (20,) + shape)
    seq = d.p_sample_loop(params, rng, shape, init_noise=init, step_noise=noise)
    par = parallel_sample_loop(
        d.apply, params, d.schedule, rng, shape,
        init_noise=init, step_noise=noise, tol=1e-2,
    )
    assert float(jnp.max(jnp.abs(par - seq))) < 0.05


def test_time_sharded_window_matches(setup, rng):
    """time_shard_axis: the windowed model call sharded over a mesh axis
    (time-axis parallelism for serving) is numerically inert."""
    from dadiff_tpu.parallel.mesh import make_mesh

    d, params = setup
    shape = (2, 8, 5)
    init = jax.random.normal(jax.random.PRNGKey(1), shape)
    noise = jax.random.normal(jax.random.PRNGKey(2), (20,) + shape)

    ref = parallel_sample_loop(
        d.apply, params, d.schedule, rng, shape,
        init_noise=init, step_noise=noise, tol=1e-6, window=8,
    )
    mesh = make_mesh({"pt": 8})
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda p: parallel_sample_loop(
                d.apply, p, d.schedule, rng, shape,
                init_noise=init, step_noise=noise, tol=1e-6, window=8,
                time_shard_axis="pt",
            )
        )(params)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_time_shard_axis_noop_without_mesh(setup, rng):
    d, params = setup
    shape = (1, 8, 5)
    out = parallel_sample_loop(
        d.apply, params, d.schedule, rng, shape, tol=1e-2,
        time_shard_axis="pt",
    )
    assert out.shape == shape and bool(jnp.all(jnp.isfinite(out)))
