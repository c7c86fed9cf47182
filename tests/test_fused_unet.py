"""Fused U-Net forward equivalence tests (CPU: XLA-reference dispatch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.fused_unet import make_fused_apply, unet_apply_fused
from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.mark.parametrize("dim_mults", [(1, 2), (1, 2, 4)])
def test_fused_apply_matches_flax(rng, dim_mults):
    unet = TemporalUnet(transition_dim=6, dim=16, dim_mults=dim_mults)
    params = unet.init_params(rng, 16)
    x = jax.random.normal(rng, (3, 16, 6))
    t = jnp.array([0, 5, 9])

    ref = unet.apply({"params": params}, x, t)
    out = unet_apply_fused(unet, params, x, t, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_apply_in_sample_loop(rng):
    """The fused apply plugs into the functional sampler."""
    from dadiff_tpu.models.diffusion import p_sample_loop
    from dadiff_tpu.ops.schedules import make_schedule

    unet = TemporalUnet(transition_dim=6, dim=8, dim_mults=(1, 2))
    params = unet.init_params(rng, 8)
    schedule = make_schedule(10, "cosine")
    apply_fn = make_fused_apply(unet, use_pallas=False)

    out = p_sample_loop(
        lambda p, x, t: apply_fn(p, x, t), params, schedule,
        jax.random.PRNGKey(0), (2, 8, 6),
    )
    assert out.shape == (2, 8, 6)
    assert np.all(np.isfinite(np.asarray(out)))
