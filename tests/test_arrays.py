"""Array utils parity tests (reference arrays.py:10-156 surface)."""

import numpy as np
import jax
import jax.numpy as jnp

from dadiff_tpu.utils.arrays import (
    apply_dict,
    atleast_2d,
    batch_to_device,
    normalize,
    set_seed,
    to_jnp,
    to_np,
    unnormalize,
)


def test_to_jnp_to_np_roundtrip():
    x = np.arange(6, dtype=np.float64).reshape(2, 3)
    arr = to_jnp(x)
    assert isinstance(arr, jax.Array) and arr.dtype == jnp.float32
    np.testing.assert_array_equal(to_np(arr), x.astype(np.float32))
    assert isinstance(to_np(x), np.ndarray)


def test_normalize_unnormalize_roundtrip():
    x = np.random.randn(10, 3).astype(np.float32)
    mean, std = x.mean(0), x.std(0)
    z = normalize(x, mean, std)
    np.testing.assert_allclose(unnormalize(z, mean, std), x, rtol=1e-4, atol=1e-5)


def test_atleast_2d():
    assert atleast_2d(np.zeros(3)).shape == (1, 3)
    assert atleast_2d(np.zeros(())).shape == (1, 1)
    assert atleast_2d(np.zeros((2, 3))).shape == (2, 3)
    assert atleast_2d(jnp.zeros(3)).shape == (1, 3)


def test_apply_dict():
    out = apply_dict(lambda v: v * 2, {"a": 1, "b": 3})
    assert out == {"a": 2, "b": 6}


def test_batch_to_device():
    batch = {"conditions": np.zeros((2, 3)), "meta": "keep"}
    out = batch_to_device(batch)
    assert isinstance(out["conditions"], jax.Array)
    assert out["meta"] == "keep"


def test_set_seed_returns_key_and_seeds_numpy():
    key = set_seed(123)
    a = np.random.rand()
    set_seed(123)
    b = np.random.rand()
    assert a == b
    assert key.shape == (2,) or key.dtype == jax.dtypes.prng_key(  # typed keys ok
        "threefry2x32"
    )
