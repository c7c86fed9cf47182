"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
by bench/integration runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dadiff_tpu.ops.pallas_kernels import (
    group_norm_mish_pallas,
    group_norm_mish_reference,
)


@pytest.mark.parametrize("shape,groups", [((2, 32, 128), 8), ((3, 16, 256), 8),
                                          ((1, 8, 64), 4)])
def test_pallas_matches_reference(shape, groups):
    rng = np.random.RandomState(0)
    B, H, C = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    scale = jnp.asarray(rng.randn(C).astype(np.float32))
    bias = jnp.asarray(rng.randn(C).astype(np.float32))

    ref = group_norm_mish_reference(x, scale, bias, n_groups=groups)
    out = group_norm_mish_pallas(x, scale, bias, n_groups=groups, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_reference_matches_torch_groupnorm():
    """The XLA reference (and hence the kernel) matches torch GroupNorm+Mish."""
    rng = np.random.RandomState(1)
    B, H, C, G = 2, 16, 64, 8
    x = rng.randn(B, H, C).astype(np.float32)
    w = rng.randn(C).astype(np.float32)
    b = rng.randn(C).astype(np.float32)

    tg = torch.nn.GroupNorm(G, C, eps=1e-5)
    with torch.no_grad():
        tg.weight.copy_(torch.from_numpy(w))
        tg.bias.copy_(torch.from_numpy(b))
        # torch layout (B, C, L)
        ref = torch.nn.Mish()(tg(torch.from_numpy(x.transpose(0, 2, 1))))
    ref = ref.numpy().transpose(0, 2, 1)

    ours = group_norm_mish_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), n_groups=G
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_reference_grad():
    """group_norm_mish differentiates via the custom VJP and matches the
    reference gradient."""
    from dadiff_tpu.ops.pallas_kernels import _group_norm_mish_ad

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 64).astype(np.float32))
    scale = jnp.asarray(rng.randn(64).astype(np.float32))
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    # On CPU the pallas forward would need interpret mode; test the vjp rule
    # directly against the reference by comparing reference-path gradients.
    g_ref = jax.grad(
        lambda x_: jnp.sum(group_norm_mish_reference(x_, scale, bias, 4))
    )(x)
    # custom bwd uses the reference vjp; evaluate it standalone
    from dadiff_tpu.ops.pallas_kernels import _gn_bwd

    gx, gs, gb = _gn_bwd(4, 1e-5, (x, scale, bias), jnp.ones((1, 8, 64)))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
    assert gs.shape == scale.shape and gb.shape == bias.shape
