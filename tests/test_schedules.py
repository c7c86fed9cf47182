"""Schedule math unit tests (reference semantics: diffusion.py:32-48,96-128)."""

import numpy as np
import jax.numpy as jnp

from dadiff_tpu.ops.schedules import (
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    extract,
)


def test_cosine_schedule_properties():
    betas = cosine_beta_schedule(100)
    assert betas.shape == (100,)
    assert np.all(betas >= 1e-4) and np.all(betas <= 0.9999)
    # cosine schedule is increasing over most of its range
    assert betas[-1] > betas[0]


def test_linear_schedule_endpoints():
    betas = linear_beta_schedule(50)
    assert np.isclose(betas[0], 1e-4)
    assert np.isclose(betas[-1], 0.02)


def test_derived_coefficients_consistency():
    s = make_schedule(64, "cosine")
    ac = np.asarray(s.alphas_cumprod, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(s.sqrt_alphas_cumprod), np.sqrt(ac), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - ac), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s.sqrt_recip_alphas_cumprod), np.sqrt(1 / ac), rtol=1e-5
    )
    # posterior variance formula
    acp = np.asarray(s.alphas_cumprod_prev, dtype=np.float64)
    betas = np.asarray(s.betas, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance), betas * (1 - acp) / (1 - ac), rtol=1e-4
    )
    assert s.n_timesteps == 64


def test_posterior_log_variance_clamped():
    s = make_schedule(100, "linear")
    assert np.all(np.isfinite(np.asarray(s.posterior_log_variance_clipped)))
    # t=0 posterior variance is 0 -> clamped log
    assert np.asarray(s.posterior_log_variance_clipped)[0] <= np.log(1e-19)


def test_extract_shapes():
    s = make_schedule(10, "cosine")
    t = jnp.array([0, 3, 9])
    out = extract(s.betas, t, 3)
    assert out.shape == (3, 1, 1)
    np.testing.assert_allclose(
        np.asarray(out).ravel(), np.asarray(s.betas)[np.array([0, 3, 9])]
    )
    # scalar t
    out0 = extract(s.betas, jnp.asarray(5), 3)
    assert out0.shape == ()
