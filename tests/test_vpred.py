"""v-prediction parameterization (models/diffusion.py::{v_from_x0_eps,
epsilon_from_v}) — new capability vs the reference (epsilon/x0 only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.diffusion import (
    GaussianDiffusion,
    epsilon_from_v,
    q_sample,
    v_from_x0_eps,
)
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.schedules import make_schedule


def test_v_eps_roundtrip_identity():
    # eps == epsilon_from_v(x_t, v) for the true (x0, eps) pair, at every t.
    sched = make_schedule(20, "cosine")
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 8, 6))
    eps = jax.random.normal(jax.random.fold_in(rng, 1), (4, 8, 6))
    for tv in (0, 7, 19):
        t = jnp.full((4,), tv, jnp.int32)
        x_t = q_sample(sched, x0, t, eps)
        v = v_from_x0_eps(sched, x0, eps, t)
        eps_back = epsilon_from_v(sched, x_t, v, t)
        np.testing.assert_allclose(
            np.asarray(eps_back), np.asarray(eps), atol=1e-5
        )


def _diffusion(prediction):
    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    return GaussianDiffusion(
        model=unet, horizon=16, observation_dim=6, action_dim=2,
        n_timesteps=10, prediction=prediction,
    )


def test_v_mode_sets_epsilon_path():
    d = _diffusion("v")
    assert d.predict_epsilon is True
    assert _diffusion("x0").predict_epsilon is False
    with pytest.raises(ValueError):
        _diffusion("nonsense")


def test_v_mode_trains_and_samples():
    d = _diffusion("v")
    params = d.init_params(jax.random.PRNGKey(0))
    loss = d.loss(
        params, jax.random.PRNGKey(1),
        jax.random.normal(jax.random.PRNGKey(2), (4, 16, 8)),
    )
    assert np.isfinite(float(loss))
    traj = d.p_sample_loop(params, jax.random.PRNGKey(3), (2, 16, 8))
    assert traj.shape == (2, 16, 8)
    assert np.all(np.isfinite(np.asarray(traj)))
    # DDIM consumes the same epsilon-wrapped apply
    traj = d.ddim_sample_loop(
        params, jax.random.PRNGKey(4), (2, 16, 8), sampling_timesteps=5
    )
    assert np.all(np.isfinite(np.asarray(traj)))


def test_v_loss_targets_v_not_eps():
    # With a model forced to output zeros, the v loss equals mean(v^2),
    # not mean(eps^2).
    d = _diffusion("v")
    params = d.init_params(jax.random.PRNGKey(0))
    zero_params = jax.tree_util.tree_map(jnp.zeros_like, params)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (64, 16, 8))
    t = jnp.zeros((64,), jnp.int32)  # t=0: v ~= -sqrt(1-a_bar_0)*x0, small
    eps = jax.random.normal(jax.random.PRNGKey(2), (64, 16, 8))
    loss_t0 = float(d.loss(zero_params, jax.random.PRNGKey(3), x0, t=t, noise=eps))
    expected = float(jnp.mean(v_from_x0_eps(d.schedule, x0, eps, t) ** 2))
    np.testing.assert_allclose(loss_t0, expected, rtol=1e-5)


def test_v_checkpoint_roundtrip(tmp_path):
    from dadiff_tpu.losses import build_loss
    from dadiff_tpu.utils.training import Trainer

    d = _diffusion("v")
    loss_fn, names = build_loss(d)
    batch = {"conditions": jnp.zeros((4, 16, 8))}
    trainer = Trainer(
        d, [batch], loss_fn, loss_names=names, log_dir=str(tmp_path), lr=1e-3
    )
    trainer.train(n_epochs=1)
    base = trainer.save_checkpoint(epoch=1)

    from dadiff_tpu.cli import load_model

    d2, params2, _ = load_model(base + ".pt", "synthetic:pointmaze")
    assert d2.prediction == "v"
    assert d2.predict_epsilon is True
