"""Anomaly detection + preemption recovery tests (SURVEY §5 gaps filled)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dadiff_tpu.datasets.sequence import SequenceDataset, create_dataloader
from dadiff_tpu.losses import build_loss
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.utils.debug import check_finite_pytree, finite_or_skip
from dadiff_tpu.utils.training import (
    Trainer,
    TrainState,
    make_optimizer,
    make_train_step,
)


def test_check_finite_pytree():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert check_finite_pytree(good) == []
    bad = {"a": jnp.array([1.0, jnp.nan]), "b": {"c": jnp.zeros(2)}}
    paths = check_finite_pytree(bad, name="state")
    assert len(paths) == 1 and "a" in paths[0]


def test_finite_or_skip():
    grads = {"w": jnp.ones(3), "v": jnp.array([jnp.inf, 0.0])}
    safe, finite = finite_or_skip(grads)
    assert not bool(finite)
    np.testing.assert_array_equal(np.asarray(safe["w"]), 0.0)
    grads_ok = {"w": jnp.ones(3)}
    safe, finite = finite_or_skip(grads_ok)
    assert bool(finite)
    np.testing.assert_array_equal(np.asarray(safe["w"]), 1.0)


def test_skip_nonfinite_train_step():
    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(model=unet, horizon=8, observation_dim=6, action_dim=2,
                          n_timesteps=10)
    loss_fn, _ = build_loss(d)
    params = d.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3)
    step = make_train_step(loss_fn, opt, use_ema=False, donate=False,
                           skip_nonfinite=True)
    state = TrainState(step=jnp.asarray(0), params=params,
                       opt_state=opt.init(params), ema_params=None)

    # poisoned batch: NaNs in the data produce non-finite grads
    bad_batch = {"conditions": jnp.full((4, 8, 8), jnp.nan)}
    new_state, metrics = step(state, bad_batch, jax.random.PRNGKey(1))
    assert float(metrics["nonfinite"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # unchanged

    good_batch = {"conditions": jnp.zeros((4, 8, 8))}
    new_state, metrics = step(state, good_batch, jax.random.PRNGKey(1))
    assert float(metrics["nonfinite"]) == 0.0

    # The critical case: a bad batch AFTER momentum has accumulated. Zeroing
    # gradients alone would still step along stale Adam momentum; the whole
    # update (params AND optimizer state) must be discarded.
    warm_state, _ = step(state, good_batch, jax.random.PRNGKey(2))
    skipped_state, metrics = step(warm_state, bad_batch, jax.random.PRNGKey(3))
    assert float(metrics["nonfinite"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(warm_state.params),
                    jax.tree_util.tree_leaves(skipped_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(warm_state.opt_state),
                    jax.tree_util.tree_leaves(skipped_state.opt_state)):
        if hasattr(a, "shape"):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_auto_resume(tmp_path):
    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(model=unet, horizon=8, observation_dim=6, action_dim=2,
                          n_timesteps=10)
    ds = SequenceDataset("synthetic:pointmaze:n=4,T=30", horizon=8)
    loader = create_dataloader(ds, batch_size=16)
    loss_fn, _ = build_loss(d)

    t1 = Trainer(d, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path),
                 save_freq=0, export_pt=False)
    t1.train(n_epochs=2)
    step = t1.global_step
    assert step > 0

    # "preempted" fresh process: new trainer, auto-resume
    t2 = Trainer(d, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path),
                 save_freq=0, export_pt=False)
    epoch = t2.load_latest()
    assert epoch is not None
    assert t2.global_step == step

    # empty dir -> None
    t3 = Trainer(d, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path / "empty"),
                 save_freq=0, export_pt=False)
    assert t3.load_latest() is None
