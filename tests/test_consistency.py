"""Consistency distillation (models/consistency.py): boundary behavior,
teacher-init property, CD training signal, few-step sampler composition, and
the distill CLI end-to-end. New capability with no reference counterpart
(the reference's only chain shortening indexes out of bounds,
/root/reference/scripts/evaluate.py:352)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dadiff_tpu.guides.sampling import (
    conditions_for_initial_obs,
    make_sampler,
)
from dadiff_tpu.models.consistency import (
    consistency_noise_levels,
    make_cd_loss,
    make_consistency_fn,
    make_consistency_sampler,
    sigma_of_t,
)
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet

H, D_OBS, D_ACT = 8, 6, 2
D = D_OBS + D_ACT


@pytest.fixture(scope="module")
def tiny():
    unet = TemporalUnet(transition_dim=D, dim=8, dim_mults=(1, 2))
    diffusion = GaussianDiffusion(
        model=unet, horizon=H, observation_dim=D_OBS, action_dim=D_ACT,
        n_timesteps=10,
    )
    params = diffusion.init_params(jax.random.PRNGKey(0))
    return diffusion, params


def test_boundary_f_is_identity_at_t0(tiny):
    """CM boundary: at the chain's smallest noise level f(x, 0) ~= x (the
    input is already ~x0)."""
    diffusion, params = tiny
    f = make_consistency_fn(diffusion)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, H, D), minval=-1, maxval=1)
    t0 = jnp.zeros((2,), jnp.int32)
    out = f(params, x, t0)
    # sigma_0 is small but nonzero; c_skip(sigma_0) ~= 1
    assert float(jnp.max(jnp.abs(out - x))) < 0.12


def test_init_equals_teacher_x0_at_chain_top(tiny):
    """With student == teacher, f at the chain top is the teacher's clipped
    x0 prediction (c_skip ~= 0 there) — the warm start that makes CD fast."""
    diffusion, params = tiny
    f = make_consistency_fn(diffusion)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, H, D))
    t = jnp.full((2,), diffusion.n_timesteps - 1, jnp.int32)
    out = f(params, x, t)

    eps = diffusion.apply(params, x, t)
    from dadiff_tpu.models.diffusion import predict_start_from_noise

    x0_teacher = jnp.clip(
        predict_start_from_noise(diffusion.schedule, x, t, eps), -1, 1
    )
    sig = float(sigma_of_t(diffusion.schedule, int(t[0])))
    c_skip = 0.25 / (sig * sig + 0.25)
    assert c_skip < 0.05  # chain top really is high-noise
    assert float(jnp.mean(jnp.abs(out - x0_teacher))) < 0.1


def test_cd_loss_decreases(tiny):
    diffusion, teacher_params = tiny
    loss_fn = make_cd_loss(diffusion, teacher_params)
    params = jax.tree_util.tree_map(jnp.copy, teacher_params)
    target = jax.tree_util.tree_map(jnp.copy, teacher_params)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    batch = {
        "conditions": jax.random.uniform(
            jax.random.PRNGKey(3), (32, H, D), minval=-1, maxval=1
        )
    }

    @jax.jit
    def step(params, target, opt_state, rng):
        (val, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng, target), has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        target = jax.tree_util.tree_map(
            lambda e, p: 0.95 * e + 0.05 * p, target, params
        )
        return params, target, opt_state, val

    vals = []
    for i in range(30):
        params, target, opt_state, val = step(
            params, target, opt_state, jax.random.PRNGKey(10 + i)
        )
        vals.append(float(val))
    assert np.mean(vals[-5:]) < np.mean(vals[:5])
    assert np.isfinite(vals).all()


def test_noise_levels_descend_and_start_at_top():
    levels = consistency_noise_levels(100, 4)
    assert levels[0] == 99
    assert (np.diff(levels) < 0).all()
    assert levels[-1] > 0  # never waste the last call at the identity
    assert len(consistency_noise_levels(100, 1)) == 1


def test_consistency_sampler_shapes_and_conditions(tiny):
    diffusion, params = tiny
    plan = make_consistency_sampler(diffusion, n_steps=3)
    obs = jnp.linspace(-0.5, 0.5, D_OBS)
    cond = conditions_for_initial_obs(obs, D_OBS, H, D)
    traj = plan(params, jax.random.PRNGKey(4), cond)
    assert traj.shape == (1, H, D)
    assert bool(jnp.all(jnp.isfinite(traj)))
    # hard inpainting holds on the output
    np.testing.assert_allclose(
        np.asarray(traj[0, 0, :D_OBS]), np.asarray(obs), rtol=0, atol=1e-6
    )
    assert len(plan.timesteps) == 3


def test_consistency_sampler_with_projection(tiny):
    from dadiff_tpu.dynamics.extractor import double_integrator_dynamics
    from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
    from dadiff_tpu.guides.sampling import ProjectionSpec
    from dadiff_tpu.ops.projection import NormStats

    diffusion, params = tiny
    A, B = double_integrator_dynamics(dt=0.1)
    P = ProjectionMatrixBuilder(A, B, 4, 2).get_projection_matrix(H)
    spec = ProjectionSpec(state_dim=4)
    plan = make_consistency_sampler(diffusion, n_steps=4, projection=spec)
    cond = conditions_for_initial_obs(jnp.zeros(D_OBS), D_OBS, H, D)
    stats = NormStats.identity(D_OBS, D_ACT)
    traj = plan(params, jax.random.PRNGKey(5), cond, jnp.asarray(P), stats)
    assert traj.shape == (1, H, D)
    assert bool(jnp.all(jnp.isfinite(traj)))


def test_make_sampler_consistency_branch(tiny):
    diffusion, params = tiny
    plan = make_sampler(diffusion, sampler="consistency", sampling_timesteps=2)
    cond = conditions_for_initial_obs(jnp.zeros(D_OBS), D_OBS, H, D)
    traj = plan(params, jax.random.PRNGKey(6), cond)
    assert traj.shape == (1, H, D)
    assert len(plan.timesteps) == 2

    with pytest.raises(ValueError, match="guidance"):
        make_sampler(diffusion, sampler="consistency",
                     guide_fn=lambda x, t: jnp.sum(x), guide_weight=1.0)
    with pytest.raises(ValueError, match="warm"):
        make_sampler(diffusion, sampler="consistency", warm_start_from=5)


def test_distill_main_end_to_end(tmp_path):
    """train tiny teacher -> distill -> the student checkpoint is marked and
    samples through the policy-facing make_sampler path."""
    from dadiff_tpu.cli import distill_main, load_model, train_main

    ds = "synthetic:pointmaze:n=8,T=30"
    teacher_dir = train_main([
        "--dataset", ds, "--horizon", "8", "--dim", "8", "--dim-mults", "1", "2",
        "--n-timesteps", "10", "--n-epochs", "1", "--batch-size", "32",
        "--warmup-steps", "5", "--log-dir", str(tmp_path / "teacher"),
        "--device", "cpu", "--save-freq", "0",
    ])
    teacher_pt = next(
        os.path.join(teacher_dir, f) for f in os.listdir(teacher_dir)
        if f.endswith(".pt")
    )
    student_dir = distill_main([
        "--checkpoint", teacher_pt, "--dataset", ds,
        "--n-epochs", "1", "--batch-size", "32", "--warmup-steps", "2",
        "--log-dir", str(tmp_path / "student"), "--device", "cpu",
        "--save-freq", "0",
    ])
    student_pt = next(
        os.path.join(student_dir, f) for f in os.listdir(student_dir)
        if f.endswith(".pt")
    )
    diffusion, params, dataset = load_model(student_pt, ds)
    assert dataset.checkpoint_config.get("consistency") is True
    plan = make_sampler(diffusion, sampler="consistency", sampling_timesteps=2)
    cond = conditions_for_initial_obs(
        jnp.zeros(diffusion.observation_dim), diffusion.observation_dim,
        diffusion.horizon, diffusion.transition_dim,
    )
    traj = plan(params, jax.random.PRNGKey(7), cond)
    assert traj.shape == (1, diffusion.horizon, diffusion.transition_dim)
    assert bool(jnp.all(jnp.isfinite(traj)))

    # Guard: a CM student refuses non-consistency samplers at eval time
    # (the student is no longer a DDPM denoiser; cli.py evaluate_main).
    from dadiff_tpu.cli import evaluate_main
    with pytest.raises(SystemExit, match="consistency-distilled"):
        evaluate_main([
            "--checkpoint", student_pt, "--dataset", ds,
            "--env", "PointMaze_UMaze-v3", "--policy-type", "guided",
            "--device", "cpu", "--n-episodes", "1",
        ])


def test_ondevice_evaluator_with_consistency_sampler(tiny):
    """The consistency student drives the fully on-device plan->step->replan
    loop (rollout.py sampler pass-through): 2-call plans per replan wave."""
    from dadiff_tpu.envs.pointmaze_jax import PointMazeJax
    from dadiff_tpu.envs.rollout import make_ondevice_evaluator
    from dadiff_tpu.ops.projection import NormStats

    diffusion, params = tiny
    env = PointMazeJax(map_name="umaze")
    evaluator = make_ondevice_evaluator(
        diffusion, env, action_horizon=4, n_replans=2,
        sampler="consistency", sampling_timesteps=2, n_candidates=2,
    )
    stats = NormStats.identity(D_OBS, D_ACT)
    metrics, state = evaluator(params, jax.random.PRNGKey(8), stats, 8)
    assert 0.0 <= float(metrics.success_rate) <= 1.0
    assert np.isfinite(float(metrics.mean_reward))


def test_cd_loss_skip_steps(tiny):
    diffusion, teacher_params = tiny
    loss_fn = make_cd_loss(diffusion, teacher_params, skip_steps=3)
    batch = {"conditions": jax.random.uniform(
        jax.random.PRNGKey(9), (8, H, D), minval=-1, maxval=1)}
    val, metrics = loss_fn(
        teacher_params, batch, jax.random.PRNGKey(10), teacher_params
    )
    assert np.isfinite(float(val))
    with pytest.raises(ValueError, match="skip_steps"):
        make_cd_loss(diffusion, teacher_params, skip_steps=0)
    with pytest.raises(ValueError, match="skip_steps"):
        make_cd_loss(diffusion, teacher_params,
                     skip_steps=diffusion.n_timesteps)
