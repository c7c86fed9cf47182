"""Test config: run everything on a virtual 8-device CPU mesh.

The driver's real-TPU bench is separate; tests follow the standard JAX
fake-backend pattern (XLA_FLAGS=--xla_force_host_platform_device_count=8).
NOTE: this environment pins JAX_PLATFORMS=axon via env; jax.config.update
after import is the reliable override here.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
