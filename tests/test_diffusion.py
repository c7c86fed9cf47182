"""GaussianDiffusion math + sampler tests (reference diffusion.py:51-294)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion, q_sample, p_sample
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.schedules import make_schedule


def make_small(n_timesteps=20, horizon=8, obs_dim=3, action_dim=2):
    unet = TemporalUnet(transition_dim=obs_dim + action_dim, dim=8, dim_mults=(1, 2))
    return GaussianDiffusion(
        model=unet,
        horizon=horizon,
        observation_dim=obs_dim,
        action_dim=action_dim,
        n_timesteps=n_timesteps,
    )


def test_q_sample_interpolates(rng):
    s = make_schedule(10, "cosine")
    x0 = jnp.ones((2, 4, 3))
    noise = jnp.zeros_like(x0)
    # with zero noise, q_sample = sqrt(acp_t) * x0
    xt = q_sample(s, x0, jnp.array([0, 9]), noise)
    expect0 = float(s.sqrt_alphas_cumprod[0])
    expect9 = float(s.sqrt_alphas_cumprod[9])
    np.testing.assert_allclose(np.asarray(xt[0]), expect0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xt[1]), expect9, rtol=1e-6)


def test_predict_start_inverts_q_sample(rng):
    d = make_small()
    x0 = jax.random.normal(rng, (2, 8, 5))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([3, 15])
    xt = d.q_sample(x0, t, noise)
    x0_rec = d.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_p_sample_no_noise_at_t0():
    mean = jnp.ones((2, 4, 3))
    log_var = jnp.zeros_like(mean)
    noise = 100.0 * jnp.ones_like(mean)
    t = jnp.array([0, 1])
    out = p_sample(mean, log_var, t, noise)
    np.testing.assert_allclose(np.asarray(out[0]), 1.0)  # t=0: mean only
    np.testing.assert_allclose(np.asarray(out[1]), 101.0)  # t=1: mean + sigma*noise


def test_loss_finite_and_scalar(rng):
    d = make_small()
    params = d.init_params(rng)
    x = jax.random.normal(rng, (4, 8, 5))
    loss = d.loss(params, jax.random.fold_in(rng, 2), x)
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_p_sample_loop_shape_and_determinism(rng):
    d = make_small()
    params = d.init_params(rng)
    key = jax.random.fold_in(rng, 3)
    out1 = d.p_sample_loop(params, key, (2, 8, 5))
    out2 = d.p_sample_loop(params, key, (2, 8, 5))
    assert out1.shape == (2, 8, 5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    assert np.all(np.isfinite(np.asarray(out1)))


def test_sampling_timesteps_truncation(rng):
    d = make_small(n_timesteps=20)
    params = d.init_params(rng)
    out = d.p_sample_loop(params, rng, (1, 8, 5), sampling_timesteps=5)
    assert out.shape == (1, 8, 5)
    with pytest.raises(ValueError):
        # reference would index OOB here (evaluate.py:352); we raise
        d.p_sample_loop(params, rng, (1, 8, 5), sampling_timesteps=21)


def test_loss_decreases_on_overfit(rng):
    """One tiny gradient sanity check: loss drops after a few Adam steps."""
    import optax

    d = make_small(n_timesteps=10)
    params = d.init_params(rng)
    x = jax.random.normal(rng, (8, 8, 5))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(lambda p: d.loss(p, key, x))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = rng
    losses = []
    for i in range(20):
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = step(params, opt_state, key)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
