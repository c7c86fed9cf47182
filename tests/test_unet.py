"""TemporalUnet shape/jit tests (reference smoke test: temporal_unet.py:244-272)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dadiff_tpu.models.temporal_unet import TemporalUnet


@pytest.mark.parametrize("dim_mults", [(1, 2), (1, 2, 4)])
def test_forward_shape(rng, dim_mults):
    horizon, transition_dim = 16, 7
    model = TemporalUnet(transition_dim=transition_dim, dim=8, dim_mults=dim_mults)
    params = model.init_params(rng, horizon)
    x = jax.random.normal(rng, (3, horizon, transition_dim))
    t = jnp.array([0, 5, 9])
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_jit_compiles_once(rng):
    model = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2))
    params = model.init_params(rng, 8)
    fn = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))
    x = jax.random.normal(rng, (2, 8, 5))
    t = jnp.zeros((2,), jnp.int32)
    out1 = fn(params, x, t)
    out2 = fn(params, x, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_time_conditioning_changes_output(rng):
    model = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2))
    params = model.init_params(rng, 8)
    x = jax.random.normal(rng, (1, 8, 5))
    out0 = model.apply({"params": params}, x, jnp.array([0]))
    out9 = model.apply({"params": params}, x, jnp.array([90]))
    assert not np.allclose(np.asarray(out0), np.asarray(out9))


def test_bfloat16_activations(rng):
    model = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2), dtype=jnp.bfloat16)
    params = model.init_params(rng, 8)
    x = jax.random.normal(rng, (2, 8, 5))
    out = model.apply({"params": params}, x, jnp.zeros((2,), jnp.int32))
    assert out.shape == x.shape
    assert out.dtype == jnp.float32  # cast back at the head
    # params stay f32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32


def test_pallas_norm_flag_same_params_and_outputs(rng):
    """use_pallas_norm keeps the param tree identical and (on the CPU
    reference dispatch path) produces identical outputs."""
    m0 = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2))
    m1 = TemporalUnet(transition_dim=5, dim=8, dim_mults=(1, 2), use_pallas_norm=True)
    p0 = m0.init_params(rng, 8)
    p1 = m1.init_params(rng, 8)
    paths0 = {jax.tree_util.keystr(k): v.shape
              for k, v in jax.tree_util.tree_flatten_with_path(p0)[0]}
    paths1 = {jax.tree_util.keystr(k): v.shape
              for k, v in jax.tree_util.tree_flatten_with_path(p1)[0]}
    assert paths0 == paths1
    x = jax.random.normal(rng, (2, 8, 5))
    t = jnp.zeros((2,), jnp.int32)
    out0 = m0.apply({"params": p0}, x, t)
    out1 = m1.apply({"params": p0}, x, t)  # same weights
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=1e-5, atol=1e-5)
