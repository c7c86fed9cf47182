"""Trainer / EMA / schedule / checkpoint tests (reference training.py:18-339)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.datasets.sequence import SequenceDataset, create_dataloader
from dadiff_tpu.losses import DiffusionLoss, ProjectionLoss, ComposedLoss, build_loss
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.utils.training import (
    EMA,
    Trainer,
    count_parameters,
    ema_update,
    make_optimizer,
    make_train_step,
    warmup_cosine_schedule,
    TrainState,
)


@pytest.fixture(scope="module")
def small_diffusion():
    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    return GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=10
    )


@pytest.fixture(scope="module")
def dataset():
    return SequenceDataset("synthetic:pointmaze:n=6,T=40", horizon=8)


def test_warmup_cosine_schedule_shape():
    sched = warmup_cosine_schedule(1e-3, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(55)) == pytest.approx(
        1e-3 * 0.5 * (1 + np.cos(np.pi * 0.5)), abs=1e-6
    )
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)
    # past total_steps stays clamped at min_lr
    assert float(sched(150)) == pytest.approx(0.0, abs=1e-9)


def test_ema_update_math():
    shadow = {"w": jnp.ones(3)}
    params = {"w": jnp.zeros(3)}
    out = ema_update(shadow, params, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)
    ema = EMA(shadow, decay=0.5)
    ema.update(params)
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 0.5)


def test_train_step_decreases_loss(small_diffusion, dataset):
    d = small_diffusion
    loss_fn, names = build_loss(d)
    params = d.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, gradient_clip=1.0)
    step = make_train_step(loss_fn, opt, use_ema=True, ema_decay=0.9)
    state = TrainState(
        step=jnp.asarray(0), params=params, opt_state=opt.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
    )
    batch = {"conditions": jnp.asarray(dataset.get_batch(np.arange(16))["conditions"])}
    losses = []
    for i in range(15):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total"]))
    assert int(state.step) == 15
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert "grad_norm" in metrics
    # EMA shadow differs from params but tracks them
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state.ema_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_composed_loss_breakdown(small_diffusion, dataset):
    from dadiff_tpu.dynamics.extractor import double_integrator_dynamics
    from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder

    d = small_diffusion
    A, B = double_integrator_dynamics(0.1)
    P = ProjectionMatrixBuilder(A, B, 4, 2).get_projection_matrix(8)
    loss_fn, names = build_loss(
        d, projection_weight=0.5, projection_matrix=P,
        normalizer=dataset.normalizer, state_dim=4,
    )
    assert names == ["diffusion", "projection"]
    params = d.init_params(jax.random.PRNGKey(0))
    batch = {"conditions": jnp.asarray(dataset.get_batch(np.arange(4))["conditions"])}
    total, metrics = loss_fn(params, batch, jax.random.PRNGKey(1))
    assert set(metrics) == {"diffusion", "projection", "total"}
    assert float(total) == pytest.approx(
        float(metrics["diffusion"]) + 0.5 * float(metrics["projection"]), rel=1e-5
    )


def test_build_loss_requires_projection_args(small_diffusion):
    with pytest.raises(ValueError):
        build_loss(small_diffusion, projection_weight=0.5)


def test_trainer_end_to_end(tmp_path, small_diffusion, dataset):
    d = small_diffusion
    loader = create_dataloader(dataset, batch_size=16, shuffle=True)
    loss_fn, names = build_loss(d)
    trainer = Trainer(
        d, loader, loss_fn,
        lr=1e-3, log_dir=str(tmp_path), save_freq=0, loss_names=names,
        export_pt=False,
    )
    n_params = count_parameters(trainer.state.params)
    assert n_params > 1000
    history = trainer.train(n_epochs=2)
    assert len(history["total"]) == 2
    assert history["total"][-1] <= history["total"][0] * 1.5  # roughly non-exploding
    assert os.path.exists(tmp_path / "training.log")
    assert os.path.exists(tmp_path / "config.json")
    # final checkpoint written
    assert any(p.name.endswith(".orbax") for p in tmp_path.iterdir())


def test_trainer_checkpoint_roundtrip(tmp_path, small_diffusion, dataset):
    d = small_diffusion
    loader = create_dataloader(dataset, batch_size=16)
    loss_fn, names = build_loss(d)
    trainer = Trainer(
        d, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path), save_freq=0,
        export_pt=True,
    )
    trainer.train(n_epochs=1)
    step = trainer.global_step
    base = os.path.join(str(tmp_path), f"checkpoint_step_{step}")

    # .pt export loads into the reference-compatible inference path
    from dadiff_tpu.io.torch_compat import (
        load_pt_checkpoint,
        infer_model_config_from_checkpoint,
        diffusion_state_to_flax,
    )

    ckpt = load_pt_checkpoint(base + ".pt")
    cfg = infer_model_config_from_checkpoint(ckpt)
    assert cfg["dim"] == 8 and cfg["horizon"] == 8
    params = diffusion_state_to_flax(ckpt["model_state_dict"])
    ref_leaf = jax.device_get(trainer.state.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(ref_leaf)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # native restore: fresh trainer, load, same params + step
    trainer2 = Trainer(
        d, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path / "t2"), save_freq=0
    )
    epoch = trainer2.load_checkpoint(base)
    assert trainer2.global_step == step
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(trainer2.state.params)),
        jax.tree_util.tree_leaves(ref_leaf),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # reset_optimizer (fine-tune) zeroes the step
    trainer3 = Trainer(
        d, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path / "t3"), save_freq=0
    )
    trainer3.load_checkpoint(base, reset_optimizer=True)
    assert trainer3.global_step == 0


def test_trainer_validation_probe(tmp_path, small_diffusion, dataset):
    d = small_diffusion
    loader = create_dataloader(dataset, batch_size=16)
    loss_fn, names = build_loss(d)
    val_batch = dataset.get_batch(np.arange(32))
    trainer = Trainer(
        d, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path), save_freq=0,
        eval_freq=5, export_pt=False, val_batch=val_batch,
    )
    v0 = trainer.evaluate()
    assert v0 is not None and np.isfinite(v0)
    history = trainer.train(n_epochs=1)
    assert "val_loss" in history
    # no val batch configured -> None
    trainer2 = Trainer(
        d, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path / "b"), save_freq=0,
        export_pt=False,
    )
    assert trainer2.evaluate() is None


def test_restore_native_tolerates_emaless_checkpoint(tmp_path):
    """Checkpoints written by EMA-less trainers (progressive-distillation
    rounds store ema_params=None as a leaf) must restore through a
    template that carries a full EMA tree (io/checkpoints.py fallback)."""
    import jax
    import jax.numpy as jnp

    from dadiff_tpu.io.checkpoints import restore_native, save_native
    from dadiff_tpu.utils.training import TrainState, make_optimizer

    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    opt = make_optimizer(1e-3)
    saved = TrainState(step=jnp.asarray(7), params=params,
                       opt_state=opt.init(params), ema_params=None)
    base = str(tmp_path / "ckpt")
    save_native(base, saved, config={"x": 1}, epoch=3)

    template = TrainState(
        step=jnp.asarray(0), params=jax.tree_util.tree_map(jnp.zeros_like,
                                                           params),
        opt_state=opt.init(params),
        ema_params=jax.tree_util.tree_map(jnp.zeros_like, params),
    )
    state, meta = restore_native(base, template)
    assert int(state.step) == 7
    assert state.ema_params is None
    assert float(state.params["w"][0]) == 1.0
    assert meta["config"] == {"x": 1}
