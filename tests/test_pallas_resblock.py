"""Fused residual-block kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.models.temporal_unet import ResidualTemporalBlock, mish
from dadiff_tpu.ops.pallas_resblock import (
    _frb_bwd,
    residual_block_pallas,
    residual_block_reference,
)


def make_params(rng, k, cin, cout, with_res):
    keys = jax.random.split(rng, 8)
    params = {
        "w1": jax.random.normal(keys[0], (k, cin, cout)) * 0.2,
        "b1": jax.random.normal(keys[1], (cout,)) * 0.1,
        "s1": jnp.ones((cout,)) + 0.1 * jax.random.normal(keys[2], (cout,)),
        "g1": 0.1 * jax.random.normal(keys[3], (cout,)),
        "w2": jax.random.normal(keys[4], (k, cout, cout)) * 0.2,
        "b2": jax.random.normal(keys[5], (cout,)) * 0.1,
        "s2": jnp.ones((cout,)),
        "g2": jnp.zeros((cout,)),
    }
    if with_res:
        params["wr"] = jax.random.normal(keys[6], (cin, cout)) * 0.2
        params["br"] = jax.random.normal(keys[7], (cout,)) * 0.1
    return params


@pytest.mark.parametrize("cin,cout,with_res", [(64, 64, False), (16, 64, True)])
def test_pallas_matches_reference(cin, cout, with_res):
    rng = jax.random.PRNGKey(0)
    params = make_params(rng, 5, cin, cout, with_res)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, cin))
    te = jax.random.normal(jax.random.fold_in(rng, 2), (2, cout))

    ref = residual_block_reference(x, te, params, n_groups=8)
    out = residual_block_pallas(x, te, params, n_groups=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_reference_matches_flax_module(rng):
    """The XLA reference composition (and hence the kernel) computes exactly
    what ResidualTemporalBlock computes, given the same weights."""
    cin, cout, k, H = 16, 32, 5, 8
    block = ResidualTemporalBlock(out_channels=cout, kernel_size=k)
    x = jax.random.normal(rng, (2, H, cin))
    t_emb = jax.random.normal(jax.random.fold_in(rng, 1), (2, 24))
    variables = block.init(rng, x, t_emb)
    flax_out = block.apply(variables, x, t_emb)

    p = variables["params"]
    params = {
        "w1": p["block1"]["conv"]["kernel"],
        "b1": p["block1"]["conv"]["bias"],
        "s1": p["block1"]["norm"]["scale"],
        "g1": p["block1"]["norm"]["bias"],
        "w2": p["block2"]["conv"]["kernel"],
        "b2": p["block2"]["conv"]["bias"],
        "s2": p["block2"]["norm"]["scale"],
        "g2": p["block2"]["norm"]["bias"],
        "wr": p["residual_conv"]["kernel"][0],  # (1,Cin,Cout) -> (Cin,Cout)
        "br": p["residual_conv"]["bias"],
    }
    # the flax block's te goes through mish->Dense inside; replicate
    te = mish(t_emb) @ p["time_dense"]["kernel"] + p["time_dense"]["bias"]

    ref = residual_block_reference(x, te, params, n_groups=8)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(flax_out),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_grad_shapes(rng):
    params = make_params(rng, 5, 16, 32, True)
    x = jax.random.normal(rng, (1, 8, 16))
    te = jax.random.normal(rng, (1, 32))
    (gx, gte, gp) = _frb_bwd(8, (x, te, params), jnp.ones((1, 8, 32)))
    assert gx.shape == x.shape and gte.shape == te.shape
    assert set(gp) == set(params)
    for k_ in params:
        assert gp[k_].shape == params[k_].shape
        assert np.all(np.isfinite(np.asarray(gp[k_])))
