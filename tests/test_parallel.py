"""Multi-device sharding tests on the virtual 8-device CPU mesh
(new capability vs the single-device reference, SURVEY.md §2.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from dadiff_tpu.datasets.sequence import SequenceDataset, create_dataloader
from dadiff_tpu.guides.sampling import conditions_for_initial_obs
from dadiff_tpu.losses import build_loss
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.parallel import (
    batch_sharding,
    make_batched_planner,
    make_mesh,
    replicated_sharding,
    shard_params_fsdp,
)
from dadiff_tpu.utils.training import Trainer


@pytest.fixture(scope="module")
def diffusion():
    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    return GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=10
    )


def test_devices_available():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual CPU devices"


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"dp": 8}
    mesh2 = make_mesh({"dp": 4, "mp": -1})
    assert mesh2.shape == {"dp": 4, "mp": 2}
    with pytest.raises(ValueError):
        make_mesh({"dp": 3})


def test_batch_sharding_places_shards():
    mesh = make_mesh()
    x = jnp.zeros((16, 8, 8))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    # each device holds 2 batch rows
    shard = xs.addressable_shards[0]
    assert shard.data.shape == (2, 8, 8)


def test_fsdp_param_sharding(diffusion):
    mesh = make_mesh()
    params = diffusion.init_params(jax.random.PRNGKey(0))
    sharded = shard_params_fsdp(params, mesh, min_elements=128)
    # at least one leaf actually sharded
    leaves = jax.tree_util.tree_leaves(sharded)
    assert any(len(l.sharding.device_set) == 8 for l in leaves)
    # values unchanged
    for a, b in zip(jax.tree_util.tree_leaves(params), leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_dp_training_matches_single_device(diffusion):
    """Gradient math under dp=8 sharding == single-device (same batch/rng)."""
    import optax

    from dadiff_tpu.utils.training import TrainState, make_train_step

    d = diffusion
    loss_fn, _ = build_loss(d)
    params = d.init_params(jax.random.PRNGKey(0))
    # SGD: updates are linear in the gradient, so this isolates the DP
    # gradient math from Adam's sign-like sensitivity to reduction order.
    opt = optax.sgd(1e-2)
    step = make_train_step(loss_fn, opt, use_ema=False, donate=False)

    batch_np = np.random.RandomState(0).randn(16, 8, 8).astype(np.float32)
    rng = jax.random.PRNGKey(1)

    def run(batch):
        state = TrainState(
            step=jnp.asarray(0), params=params, opt_state=opt.init(params),
            ema_params=None,
        )
        state, metrics = step(state, {"conditions": batch}, rng)
        return state, metrics

    # single device
    _, m1 = run(jnp.asarray(batch_np))
    s1, _ = run(jnp.asarray(batch_np))

    # sharded over the mesh
    mesh = make_mesh()
    batch_sharded = jax.device_put(jnp.asarray(batch_np), batch_sharding(mesh))
    s2, m2 = run(batch_sharded)

    assert float(m1["total"]) == pytest.approx(float(m2["total"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_trainer_with_mesh(tmp_path, diffusion):
    ds = SequenceDataset("synthetic:pointmaze:n=6,T=40", horizon=8)
    loader = create_dataloader(ds, batch_size=16)
    loss_fn, names = build_loss(diffusion)
    mesh = make_mesh()
    trainer = Trainer(
        diffusion, loader, loss_fn, lr=1e-3, log_dir=str(tmp_path),
        save_freq=0, mesh=mesh, export_pt=False,
    )
    history = trainer.train(n_epochs=1)
    assert np.isfinite(history["total"][0])


def test_batched_planner_sharded(diffusion):
    mesh = make_mesh()
    params = diffusion.init_params(jax.random.PRNGKey(0))
    planner = make_batched_planner(diffusion, mesh)
    obs = jnp.tile(jnp.linspace(-1, 1, 6)[None], (32, 1))
    cond = conditions_for_initial_obs(obs, 6, 8, 8)
    traj = planner(params, jax.random.PRNGKey(2), cond)
    assert traj.shape == (32, 8, 8)
    assert len(traj.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(traj[:, 0, :6]), np.asarray(obs), atol=1e-5)
    assert np.all(np.isfinite(np.asarray(traj)))


def test_planner_scale_1024_dp8(diffusion):
    """BASELINE.json configs[4]: 1024 vmapped guided samplers sharded dp=8,
    with measured dp=1 vs dp=8 wall-clock logged (VERDICT round-1 #6)."""
    import time

    params = diffusion.init_params(jax.random.PRNGKey(0))
    obs = jnp.tile(jnp.linspace(-1, 1, 6)[None], (1024, 1))
    cond = conditions_for_initial_obs(obs, 6, 8, 8)

    from dadiff_tpu.guides.sampling import make_sampler

    single = make_sampler(diffusion, sampling_timesteps=5)

    def timed(fn, *args):
        fn(*args).block_until_ready()  # compile
        t0 = time.time()
        out = fn(*args)
        out.block_until_ready()
        return out, time.time() - t0

    traj1, dt1 = timed(single, params, jax.random.PRNGKey(2), cond)

    mesh = make_mesh()
    planner = make_batched_planner(diffusion, mesh, sampling_timesteps=5)
    traj8, dt8 = timed(planner, params, jax.random.PRNGKey(2), cond)

    assert traj8.shape == (1024, 8, 8)
    assert len(traj8.sharding.device_set) == 8
    assert np.all(np.isfinite(np.asarray(traj8)))
    np.testing.assert_allclose(
        np.asarray(traj8[:, 0, :6]), np.asarray(obs), atol=1e-5
    )
    print(f"\n1024-planner wall-clock: dp=1 {dt1*1e3:.0f} ms, "
          f"dp=8 {dt8*1e3:.0f} ms (virtual CPU mesh)")


def test_ondevice_rollout_under_mesh(diffusion):
    """On-device plan->step->replan with the env batch sharded over dp=8
    (BASELINE configs[4] north-star loop under a mesh)."""
    import time

    from dadiff_tpu.envs.pointmaze_jax import PointMazeJax
    from dadiff_tpu.envs.rollout import make_ondevice_evaluator
    from dadiff_tpu.ops.projection import NormStats

    env = PointMazeJax(map_name="umaze")
    params = diffusion.init_params(jax.random.PRNGKey(0))
    stats = NormStats.identity(6, 2)
    mesh = make_mesh()

    ev_mesh = make_ondevice_evaluator(
        diffusion, env, action_horizon=4, n_replans=2,
        sampling_timesteps=5, mesh=mesh,
    )
    ev_single = make_ondevice_evaluator(
        diffusion, env, action_horizon=4, n_replans=2, sampling_timesteps=5,
    )

    def timed(ev):
        m, _ = ev(params, jax.random.PRNGKey(1), stats, 256)  # compile
        jax.block_until_ready(m)
        t0 = time.time()
        m, state = ev(params, jax.random.PRNGKey(1), stats, 256)
        jax.block_until_ready(m)
        return m, state, time.time() - t0

    m8, state8, dt8 = timed(ev_mesh)
    m1, _, dt1 = timed(ev_single)

    assert np.isfinite(float(m8.mean_reward))
    assert 0.0 <= float(m8.success_rate) <= 1.0
    assert len(state8.pos.sharding.device_set) == 8
    # identical math regardless of sharding
    assert float(m8.mean_final_distance) == pytest.approx(
        float(m1.mean_final_distance), rel=1e-4
    )
    print(f"\n256-env rollout wall-clock: dp=1 {dt1*1e3:.0f} ms, "
          f"dp=8 {dt8*1e3:.0f} ms (virtual CPU mesh)")
