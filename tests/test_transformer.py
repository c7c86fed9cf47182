"""TemporalTransformer (DiT-style) denoiser family tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_transformer import TemporalTransformer


@pytest.fixture(scope="module")
def model():
    return TemporalTransformer(transition_dim=8, dim=32, depth=2, n_heads=4)


@pytest.fixture(scope="module")
def params(model):
    return model.init_params(jax.random.PRNGKey(0), horizon=16, batch_size=2)


def test_output_shape(model, params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    t = jnp.array([0, 5])
    y = model.apply({"params": params}, x, t)
    assert y.shape == x.shape
    assert y.dtype == jnp.float32


def test_adaln_zero_init_outputs_zero(model, params):
    # DiT adaLN-Zero: gates and the final projection are zero-initialized,
    # so the untrained denoiser predicts exactly zero noise.
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 8))
    y = model.apply({"params": params}, x, jnp.array([3, 7]))
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-7)


def test_any_horizon_no_divisibility_constraint(model):
    # U-Nets need horizon % 2**(levels-1) == 0; the transformer doesn't.
    for h in (7, 24, 33):
        p = model.init_params(jax.random.PRNGKey(3), horizon=h)
        x = jax.random.normal(jax.random.PRNGKey(4), (1, h, 8))
        y = model.apply({"params": p}, x, jnp.array([1]))
        assert y.shape == (1, h, 8)


def test_timestep_conditioning_matters(model, params):
    # After perturbing params away from the zero init, different timesteps
    # must produce different outputs (adaLN modulation is live).
    params_p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(5), a.shape),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 8))
    y0 = model.apply({"params": params_p}, x, jnp.array([0]))
    y9 = model.apply({"params": params_p}, x, jnp.array([9]))
    assert float(jnp.abs(y0 - y9).max()) > 1e-4


def test_drops_into_gaussian_diffusion(model):
    d = GaussianDiffusion(
        model=model, horizon=16, observation_dim=6, action_dim=2, n_timesteps=8
    )
    params = d.init_params(jax.random.PRNGKey(0))
    loss = d.loss(
        params, jax.random.PRNGKey(1),
        jax.random.normal(jax.random.PRNGKey(2), (4, 16, 8)),
    )
    assert np.isfinite(float(loss))
    traj = d.p_sample_loop(params, jax.random.PRNGKey(3), (2, 16, 8))
    assert traj.shape == (2, 16, 8)
    assert np.all(np.isfinite(np.asarray(traj)))


def test_trainer_and_native_checkpoint_roundtrip(tmp_path):
    # Full train step + orbax save + cli.load_model native restore rebuilds
    # the transformer from the recorded model_type config.
    from dadiff_tpu.losses import build_loss
    from dadiff_tpu.utils.training import Trainer

    model = TemporalTransformer(transition_dim=8, dim=16, depth=1, n_heads=2)
    d = GaussianDiffusion(
        model=model, horizon=8, observation_dim=6, action_dim=2, n_timesteps=6
    )
    loss_fn, names = build_loss(d)

    class _Norm:
        normalizer_name = "LimitsNormalizer"

        def as_arrays(self):
            return {
                "obs_mean": np.zeros(6), "obs_std": np.ones(6),
                "action_mean": np.zeros(2), "action_std": np.ones(2),
            }

    batch = {"conditions": jnp.zeros((4, 8, 8))}
    trainer = Trainer(
        d, [batch, batch], loss_fn, loss_names=names,
        log_dir=str(tmp_path), lr=1e-3, normalizer=_Norm(),
    )
    trainer.train(n_epochs=1)
    base = trainer.save_checkpoint(epoch=1)
    # transformer checkpoints are orbax-native only (no .pt schema)
    import os

    assert os.path.isdir(base + ".orbax")
    assert not os.path.exists(base + ".pt")

    from dadiff_tpu.cli import load_model

    d2, params2, dataset2 = load_model(base, "synthetic:pointmaze")
    assert type(d2.model).__name__ == "TemporalTransformer"
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8))
    y = d2.apply(params2, x, jnp.array([2]))
    assert y.shape == (1, 8, 8)


def test_train_cli_transformer(tmp_path):
    from dadiff_tpu.cli import train_main

    train_main([
        "--dataset", "synthetic:pointmaze", "--model-type", "transformer",
        "--horizon", "8", "--dim", "16", "--depth", "1", "--n-heads", "2",
        "--n-timesteps", "6", "--n-epochs", "1", "--batch-size", "16",
        "--log-dir", str(tmp_path), "--device", "cpu",
    ])
    import glob

    assert glob.glob(str(tmp_path / "*" / "checkpoint_step_*.orbax"))


def test_dp_sharding_composes(model):
    # The transformer trains under the same dp mesh machinery as the U-Net.
    from dadiff_tpu.losses import build_loss
    from dadiff_tpu.parallel.mesh import batch_sharding, make_mesh
    from dadiff_tpu.utils.training import TrainState, make_optimizer, make_train_step

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_mesh({"dp": 4}, devices=jax.devices()[:4])
    d = GaussianDiffusion(
        model=model, horizon=16, observation_dim=6, action_dim=2, n_timesteps=8
    )
    params = d.init_params(jax.random.PRNGKey(0))
    loss_fn, _ = build_loss(d)
    opt = make_optimizer(1e-3, gradient_clip=1.0)
    state = TrainState(
        step=jnp.asarray(0), params=params, opt_state=opt.init(params),
        ema_params=None,
    )
    step = make_train_step(loss_fn, opt, use_ema=False, donate=False)
    batch = {
        "conditions": jax.device_put(
            jnp.zeros((8, 16, 8)), batch_sharding(mesh, "dp")
        )
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))


def test_tp_sharded_forward_matches_single_device(model, params):
    # Megatron-style head sharding (parallel/tp.py attn rules) is
    # numerically inert on the virtual mesh.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dadiff_tpu.parallel.mesh import make_mesh
    from dadiff_tpu.parallel.tp import shard_params_tp, unet_param_specs

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 8))
    t = jnp.arange(8) % 10
    # perturb away from adaLN-zero so the output is nontrivial
    params_p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(5), a.shape),
        params,
    )
    ref = model.apply({"params": params_p}, x, t)

    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
    specs = unet_param_specs(params_p, mesh, tp_axis="tp")
    # attention q/k/v kernels (in, heads, head_dim): heads dim sharded
    assert specs["block_0"]["attn"]["query"]["kernel"] == P(None, "tp", None)
    # attention out kernel (heads, head_dim, out): heads dim sharded
    assert specs["block_0"]["attn"]["out"]["kernel"] == P("tp", None, None)

    sharded_model = TemporalTransformer(
        transition_dim=8, dim=32, depth=2, n_heads=4,
        act_spec=("dp", "sp", "tp"),
    )
    sharded = shard_params_tp(params_p, mesh, tp_axis="tp")
    with jax.set_mesh(mesh):
        fwd = jax.jit(lambda p, x, t: sharded_model.apply({"params": p}, x, t))
        out = fwd(
            sharded,
            jax.device_put(x, NamedSharding(mesh, P("dp"))),
            jax.device_put(t, NamedSharding(mesh, P("dp"))),
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
