"""DPM-Solver++(2M) sampler tests (arXiv:2211.01095; new fast-sampling
capability beyond DDIM, composing with conditioning/guidance/projection)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.guides.sampling import (
    Conditions,
    conditions_for_initial_obs,
    make_sampler,
)
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.fixture(scope="module")
def d():
    unet = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2))
    return GaussianDiffusion(
        model=unet, horizon=8, observation_dim=3, action_dim=2, n_timesteps=50
    )


@pytest.fixture(scope="module")
def params(d, rng):
    return d.init_params(rng)


def _no_cond(horizon, dim, batch=2):
    return Conditions(
        values=jnp.zeros((batch, horizon, dim)),
        mask=jnp.zeros((horizon,), bool),
    )


def test_dpmpp_shapes_determinism_finite(d, params):
    plan = make_sampler(d, sampler="dpmpp", sampling_timesteps=10)
    cond = _no_cond(8, 5)
    out1 = plan(params, jax.random.PRNGKey(0), cond)
    out2 = plan(params, jax.random.PRNGKey(0), cond)
    assert out1.shape == (2, 8, 5)
    assert np.all(np.isfinite(np.asarray(out1)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    # deterministic solver: a different key changes only the init noise
    out3 = plan(params, jax.random.PRNGKey(1), cond)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_dpmpp_matches_ddim_at_full_steps(d, params):
    """Both are deterministic ODE solvers of the same probability flow —
    at the full step count they must land near the same sample."""
    cond = _no_cond(8, 5, batch=4)
    ddim = make_sampler(d, sampler="ddim", sampling_timesteps=50)
    dpmpp = make_sampler(d, sampler="dpmpp", sampling_timesteps=50)
    a = np.asarray(ddim(params, jax.random.PRNGKey(0), cond))
    b = np.asarray(dpmpp(params, jax.random.PRNGKey(0), cond))
    assert np.max(np.abs(a - b)) < 0.15, np.max(np.abs(a - b))


def test_dpmpp_fewstep_closer_than_ddim(d, rng):
    """The point of the second-order solver: at a small step budget, dpmpp
    tracks the dense-step solution better than DDIM. Needs a model whose
    eps-field is smooth in t — a briefly TRAINED one, not random weights
    (random nets have no coherent probability flow for the solver order to
    exploit)."""
    import optax

    # train the toy denoiser on a simple structured distribution
    rs = np.random.RandomState(0)
    base = np.sin(np.linspace(0, np.pi, 8))[None, :, None]
    data = (base * rs.uniform(0.2, 1.0, (256, 1, 5))).astype(np.float32)
    data = jnp.asarray(data)

    params = d.init_params(rng)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: d.loss(p, key, data)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(200):
        params, opt_state, _ = step(params, opt_state, jax.random.fold_in(rng, i))

    cond = _no_cond(8, 5, batch=8)
    ref = np.asarray(
        make_sampler(d, sampler="ddim", sampling_timesteps=50)(
            params, jax.random.PRNGKey(0), cond
        )
    )
    err = {}
    for s in ("ddim", "dpmpp"):
        few = np.asarray(
            make_sampler(d, sampler=s, sampling_timesteps=8)(
                params, jax.random.PRNGKey(0), cond
            )
        )
        err[s] = float(np.mean((few - ref) ** 2))
    assert err["dpmpp"] < err["ddim"], err


def test_dpmpp_conditioning_respected(d, params):
    obs = jnp.asarray([0.3, -0.2, 0.5])
    cond = conditions_for_initial_obs(obs, 3, 8, 5)
    plan = make_sampler(d, sampler="dpmpp", sampling_timesteps=10)
    out = np.asarray(plan(params, jax.random.PRNGKey(0), cond))
    np.testing.assert_allclose(out[0, 0, :3], np.asarray(obs), atol=1e-6)
    np.testing.assert_allclose(out[0, 0, 3:], 0.0, atol=1e-6)


def test_dpmpp_with_guidance_and_projection(d, params):
    """Guidance shifts the samples; projection composes without NaNs."""
    from dadiff_tpu.guides.sampling import ProjectionSpec
    from dadiff_tpu.ops.projection import NormStats

    def guide(x, t):
        return jnp.mean(x[:, :, 0], axis=1)

    cond = _no_cond(8, 5)
    plain = make_sampler(d, sampler="dpmpp", sampling_timesteps=10)(
        params, jax.random.PRNGKey(0), cond
    )
    guided = make_sampler(
        d, sampler="dpmpp", sampling_timesteps=10, guide_fn=guide,
        guide_weight=5.0,
    )(params, jax.random.PRNGKey(0), cond)
    assert float(jnp.mean(guided[:, :, 0])) > float(jnp.mean(plain[:, :, 0]))

    # projection: P = identity keeps values; exercise the composed path
    n, m = 2, 2
    P = jnp.eye((8 + 1) * n + 8 * m)
    spec = ProjectionSpec(state_dim=n, schedule="constant", strength=1.0)
    stats = NormStats.identity(3, 2)
    out = make_sampler(d, sampler="dpmpp", sampling_timesteps=10,
                       projection=spec)(
        params, jax.random.PRNGKey(0), cond, P, stats
    )
    assert np.all(np.isfinite(np.asarray(out)))
