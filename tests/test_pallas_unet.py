"""Whole-chain Pallas megakernel equivalence (interpret mode on CPU).

The megakernel (ops/pallas_unet.py) runs the entire reverse-diffusion loop
as one pallas_call. With float32 weights it must match the XLA fast sampler
to float tolerance; bfloat16 weights (the TPU latency configuration) to
loose tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.fast_sampler import fast_p_sample_loop
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.pallas_unet import (
    flatten_unet_params,
    pallas_p_sample_loop,
)

H, D, T = 32, 8, 8


@pytest.fixture(scope="module")
def setup():
    unet = TemporalUnet(transition_dim=D, dim=32, dim_mults=(1, 2, 4))
    d = GaussianDiffusion(
        model=unet, horizon=H, observation_dim=6, action_dim=2, n_timesteps=T
    )
    params = d.init_params(jax.random.PRNGKey(0))
    init = jax.random.normal(jax.random.PRNGKey(1), (1, H, D))
    noise = jax.random.normal(jax.random.PRNGKey(2), (T, 1, H, D))
    gold = fast_p_sample_loop(
        unet, params, d.schedule, jax.random.PRNGKey(5), (1, H, D),
        init_noise=init, step_noise=noise,
    )
    return unet, d, params, init, noise, gold


def test_megakernel_f32_matches_xla(setup):
    unet, d, params, init, noise, gold = setup
    out = pallas_p_sample_loop(
        unet, params, d.schedule, jax.random.PRNGKey(5), (1, H, D),
        interpret=True, weight_dtype=jnp.float32,
        init_noise=init, step_noise=noise,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold), atol=1e-4)


def test_megakernel_bf16_close_to_xla(setup):
    unet, d, params, init, noise, gold = setup
    out = pallas_p_sample_loop(
        unet, params, d.schedule, jax.random.PRNGKey(5), (1, H, D),
        interpret=True, weight_dtype=jnp.bfloat16,
        init_noise=init, step_noise=noise,
    )
    # trajectories live in [-1, 1]; bf16 weight rounding stays small
    assert float(jnp.abs(out - gold).max()) < 0.15


def test_megakernel_two_level_arch(setup):
    # different dim_mults exercise the layer-plan walker
    unet = TemporalUnet(transition_dim=D, dim=16, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=16, observation_dim=6, action_dim=2, n_timesteps=4
    )
    params = d.init_params(jax.random.PRNGKey(0))
    init = jax.random.normal(jax.random.PRNGKey(1), (1, 16, D))
    noise = jax.random.normal(jax.random.PRNGKey(2), (4, 1, 16, D))
    gold = fast_p_sample_loop(
        unet, params, d.schedule, jax.random.PRNGKey(5), (1, 16, D),
        init_noise=init, step_noise=noise,
    )
    out = pallas_p_sample_loop(
        unet, params, d.schedule, jax.random.PRNGKey(5), (1, 16, D),
        interpret=True, weight_dtype=jnp.float32,
        init_noise=init, step_noise=noise,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold), atol=1e-4)


def test_flatten_params_count_and_shapes(setup):
    unet, d, params, *_ = setup
    flat = flatten_unet_params(unet, params)
    assert all(a.ndim == 2 for a in flat)
    # 3-level arch: 12 weight-bearing module groups; spot-check first conv
    assert flat[0].shape == (5 * D, 32)  # down_0_res1 block1 conv, tap-major


def test_megakernel_conditioned_matches_guided_sampler(setup):
    """cond: row-0 inpainting applied to the initial iterate AND every step
    — must reproduce the make_sampler conditioning path exactly (same PRNG
    split pattern => identical noise draws)."""
    from dadiff_tpu.guides.sampling import (
        conditions_for_initial_obs,
        make_sampler,
    )

    unet, d, params, init, noise, gold = setup
    obs = jnp.linspace(-0.5, 0.5, 6)
    cond = conditions_for_initial_obs(obs, 6, H, D)
    key = jax.random.PRNGKey(9)

    ref = make_sampler(d, jit=False)(params, key, cond)
    out = pallas_p_sample_loop(
        unet, params, d.schedule, key, (1, H, D),
        interpret=True, weight_dtype=jnp.float32,
        cond=cond.values[0] if cond.values.ndim == 3 else cond.values,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_megakernel_forwards_predict_epsilon_and_clip(setup):
    """predict_epsilon=False / clip_denoised=False reach the kernel (were
    silently ignored before)."""
    from dadiff_tpu.models.diffusion import p_sample_loop

    unet, d, params, init, noise, gold = setup
    ref = p_sample_loop(
        d.apply, params, d.schedule, jax.random.PRNGKey(5),
        (1, H, D), init_noise=init, step_noise=noise,
        clip_denoised=False, predict_epsilon=False,
    )
    out = pallas_p_sample_loop(
        unet, params, d.schedule, jax.random.PRNGKey(5), (1, H, D),
        interpret=True, weight_dtype=jnp.float32,
        init_noise=init, step_noise=noise,
        clip_denoised=False, predict_epsilon=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # and differs from the default-config chain (proves the flags act)
    assert float(jnp.max(jnp.abs(out - gold))) > 1e-3
