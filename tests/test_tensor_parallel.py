"""Tensor / sequence parallelism (parallel/tp.py).

The reference has no parallelism layer at all (SURVEY.md §2.2). These tests
prove that tp (channel) and sp (horizon) sharding of the Temporal U-Net are
*numerically inert*: outputs and training steps match the single-device
program on the 8-device virtual CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.parallel.mesh import make_mesh
from dadiff_tpu.parallel.tp import (
    maybe_constrain,
    shard_params_tp,
    unet_param_specs,
)


def _unet(act_spec=None, dim=32, mults=(1, 2)):
    return TemporalUnet(
        transition_dim=8, dim=dim, dim_mults=mults, act_spec=act_spec
    )


def _data(horizon=16, batch=8):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(batch, horizon, 8), jnp.float32)
    t = jnp.asarray(r.randint(0, 20, (batch,)), jnp.int32)
    return x, t


def test_maybe_constrain_noop_without_mesh():
    x = jnp.ones((4, 8, 8))
    y = maybe_constrain(x, ("dp", None, "tp"))
    assert y is x


def test_param_specs_shard_conv_out_channels():
    unet = _unet()
    x, t = _data()
    params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
    mesh = make_mesh({"dp": 4, "tp": 2})
    specs = unet_param_specs(params, mesh, tp_axis="tp")
    # nn.Conv kernel (k, in, out): tp on the output-channel dim
    assert specs["down_0_res1"]["block1"]["conv"]["kernel"] == P(None, None, "tp")
    # ConvTranspose1d kernel (k, out, in): tp on dim 1
    assert specs["up_0_upsample"]["kernel"] == P(None, "tp", None)
    # Time-MLP dense kernels replicate when the per-device shard would be
    # < 128 lanes (GSPMD would weight-gather them anyway; see tp.py)
    assert specs["time_dense1"]["kernel"] == P(None, None)
    # transition_dim=8 output of final_conv is < min_size: replicated
    assert specs["final_conv"]["kernel"] == P(None, None, None)


@pytest.mark.parametrize(
    "axes,act_spec",
    [
        ({"dp": 4, "tp": 2}, ("dp", None, "tp")),
        ({"dp": 4, "sp": 2}, ("dp", "sp", None)),
        ({"dp": 2, "sp": 2, "tp": 2}, ("dp", "sp", "tp")),
    ],
    ids=["tp", "sp", "dp-sp-tp"],
)
def test_sharded_forward_matches_single_device(axes, act_spec):
    x, t = _data()
    ref_unet = _unet()
    params = ref_unet.init(jax.random.PRNGKey(0), x, t)["params"]
    ref = ref_unet.apply({"params": params}, x, t)

    mesh = make_mesh(axes)
    unet = _unet(act_spec=act_spec)
    sharded = (
        shard_params_tp(params, mesh, tp_axis="tp")
        if "tp" in axes
        else jax.device_put(params, NamedSharding(mesh, P()))
    )
    with jax.set_mesh(mesh):
        fwd = jax.jit(lambda p, x, t: unet.apply({"params": p}, x, t))
        out = fwd(
            sharded,
            jax.device_put(x, NamedSharding(mesh, P("dp"))),
            jax.device_put(t, NamedSharding(mesh, P("dp"))),
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_param_leaves_actually_sharded():
    x, t = _data()
    unet = _unet()
    params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
    mesh = make_mesh({"dp": 4, "tp": 2})
    sharded = shard_params_tp(params, mesh, tp_axis="tp")
    leaf = sharded["mid_block1"]["block1"]["conv"]["kernel"]
    assert "tp" in (leaf.sharding.spec or ())
    # device-local shard is half the channels
    assert leaf.addressable_shards[0].data.shape[-1] == leaf.shape[-1] // 2


def test_tp_fsdp_2d_param_sharding():
    x, t = _data()
    unet = _unet(dim=64)
    params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
    mesh = make_mesh({"fsdp": 4, "tp": 2})
    specs = unet_param_specs(params, mesh, tp_axis="tp", fsdp_axis="fsdp")
    spec = specs["mid_block1"]["block1"]["conv"]["kernel"]
    assert "tp" in spec and "fsdp" in spec  # 2-D sharded kernel


def test_tp_train_step_matches_single_device():
    from dadiff_tpu.losses import build_loss
    from dadiff_tpu.utils.training import TrainState, make_optimizer, make_train_step

    def build(act_spec=None):
        unet = _unet(act_spec=act_spec)
        return GaussianDiffusion(
            model=unet, horizon=16, observation_dim=6, action_dim=2,
            n_timesteps=10,
        )

    ref_diff = build()
    params = ref_diff.init_params(jax.random.PRNGKey(0))
    batch = {
        "conditions": jnp.asarray(
            np.random.RandomState(1).randn(8, 16, 8), jnp.float32
        )
    }
    rng = jax.random.PRNGKey(2)

    import optax

    def run(diff, params, mesh=None):
        loss_fn, _ = build_loss(diff)
        # SGD, not Adam: Adam's sqrt(v)-normalized first step amplifies
        # ~1e-7 cross-shard reduction-order noise to O(lr), which would make
        # the parity comparison meaningless. With SGD the param delta is
        # exactly the gradient, so this checks gradient parity.
        opt = optax.sgd(1e-2)
        state = TrainState(
            step=jnp.asarray(0), params=params,
            opt_state=opt.init(params), ema_params=None,
        )
        step = make_train_step(loss_fn, opt, use_ema=False, donate=False)
        b = batch
        if mesh is not None:
            b = {
                "conditions": jax.device_put(
                    batch["conditions"], NamedSharding(mesh, P("dp"))
                )
            }
        new_state, metrics = step(state, b, rng)
        return new_state, metrics

    ref_state, ref_metrics = run(ref_diff, params)

    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
    tp_params = shard_params_tp(params, mesh, tp_axis="tp")
    with jax.set_mesh(mesh):
        tp_state, tp_metrics = run(build(("dp", "sp", "tp")), tp_params, mesh)
        jax.block_until_ready(tp_state)

    np.testing.assert_allclose(
        float(tp_metrics["total"]), float(ref_metrics["total"]), atol=1e-5
    )
    ref_leaf = ref_state.params["mid_block1"]["block1"]["conv"]["kernel"]
    tp_leaf = tp_state.params["mid_block1"]["block1"]["conv"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(tp_leaf), np.asarray(ref_leaf), atol=1e-4
    )


def test_batched_planner_composes_with_tp():
    """Serving composition: batch sharded over 'dp' AND the U-Net sharded
    over 'tp' in one program — the planner's plans match the unsharded
    single-device plans."""
    from dadiff_tpu.guides.sampling import conditions_for_initial_obs, make_sampler
    from dadiff_tpu.parallel.planner import make_batched_planner

    ref_unet = _unet()
    ref_diff = GaussianDiffusion(
        model=ref_unet, horizon=16, observation_dim=6, action_dim=2,
        n_timesteps=10,
    )
    params = ref_diff.init_params(jax.random.PRNGKey(0))
    obs = jnp.tile(jnp.linspace(-1, 1, 6)[None], (8, 1))
    cond = conditions_for_initial_obs(obs, 6, 16, 8)
    key = jax.random.PRNGKey(7)
    ref = make_sampler(ref_diff, jit=False)(params, key, cond)

    mesh = make_mesh({"dp": 4, "tp": 2})
    tp_unet = _unet(act_spec=("dp", None, "tp"))
    tp_diff = GaussianDiffusion(
        model=tp_unet, horizon=16, observation_dim=6, action_dim=2,
        n_timesteps=10,
    )
    tp_params = shard_params_tp(params, mesh, tp_axis="tp")
    with jax.set_mesh(mesh):
        planner = make_batched_planner(tp_diff, mesh, batch_axis="dp")
        out = planner(tp_params, key, cond)
        out.block_until_ready()
    assert "dp" in (out.sharding.spec or ())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


# ---------------------------------------------------------------------------
# Collective-structure assertions (VERDICT r2 #6): loss-is-finite is not
# enough — assert the compiled HLO contains the EXPECTED collectives and no
# pathological full-weight gathers.
# ---------------------------------------------------------------------------

from dadiff_tpu.parallel.comm_analysis import (  # noqa: E402
    collective_summary,
    weight_gather_violations,
)


def _compile_sharded_forward(axes, act_spec, dim=32, mults=(1, 2)):
    x, t = _data()
    unet = _unet(act_spec=act_spec, dim=dim, mults=mults)
    params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
    mesh = make_mesh(axes)
    sharded = (
        shard_params_tp(params, mesh, tp_axis="tp")
        if "tp" in axes
        else jax.device_put(params, NamedSharding(mesh, P()))
    )
    with jax.set_mesh(mesh):
        fwd = jax.jit(lambda p, x, t: unet.apply({"params": p}, x, t))
        xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
        ts = jax.device_put(t, NamedSharding(mesh, P("dp")))
        compiled = fwd.lower(sharded, xs, ts).compile()
    return compiled, params


def test_tp_forward_collective_structure():
    compiled, params = _compile_sharded_forward(
        {"dp": 4, "tp": 2}, ("dp", None, "tp")
    )
    summary = collective_summary(compiled)
    # tp contractions (channel-sharded convs feeding replicated/resharded
    # consumers) must psum: all-reduce present
    assert summary.get("all-reduce", {}).get("count", 0) >= 1, summary
    # and the sharding must not undo itself by gathering whole kernels
    assert weight_gather_violations(summary, params) == [], summary


def test_sp_forward_collective_structure():
    compiled, params = _compile_sharded_forward(
        {"dp": 4, "sp": 2}, ("dp", "sp", None)
    )
    summary = collective_summary(compiled)
    # horizon-sharded 1-D convs need halo exchange: collective-permute
    # (GSPMD may lower small halos as all-gathers of boundary slices —
    # accept either, but SOMETHING must move sequence boundaries)
    moved = (
        summary.get("collective-permute", {}).get("count", 0)
        + summary.get("all-gather", {}).get("count", 0)
    )
    assert moved >= 1, summary
    assert weight_gather_violations(summary, params) == [], summary


def test_tp_train_step_collective_structure():
    """The tp-sharded TRAIN step: grads of channel-sharded kernels stay
    sharded (no full-weight gathers), dp grad reduction psums."""
    import optax

    from dadiff_tpu.losses import build_loss

    unet = _unet(act_spec=("dp", None, "tp"))
    diff = GaussianDiffusion(
        model=unet, horizon=16, observation_dim=6, action_dim=2, n_timesteps=10
    )
    params = diff.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh({"dp": 4, "tp": 2})
    sharded = shard_params_tp(params, mesh, tp_axis="tp")
    batch = {
        "conditions": jnp.asarray(
            np.random.RandomState(1).randn(8, 16, 8), jnp.float32
        )
    }
    loss_fn, _ = build_loss(diff)

    def step(p, batch, rng):
        (val, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, rng
        )
        return val, jax.tree_util.tree_map(
            lambda a, g: a - 1e-3 * g, p, grads
        )

    with jax.set_mesh(mesh):
        xb = jax.device_put(
            batch, NamedSharding(mesh, P("dp"))
        )
        compiled = (
            jax.jit(step).lower(sharded, xb, jax.random.PRNGKey(2)).compile()
        )
    summary = collective_summary(compiled)
    assert summary.get("all-reduce", {}).get("count", 0) >= 1, summary
    assert weight_gather_violations(summary, params) == [], summary
