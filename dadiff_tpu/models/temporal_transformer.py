"""DiT-style temporal transformer denoiser — the framework's second model
family (no reference counterpart; the reference ships only the conv U-Net,
m_diffuser/models/temporal_unet.py).

Design, TPU-first:

  * Every FLOP is a dense matmul (QKV/attention/MLP) — the MXU's native op,
    with no strided convs or transposes. At planning horizons (32-128
    tokens) attention is tiny; the MLP dominates and tiles perfectly.
  * adaLN-Zero timestep conditioning (Peebles & Xie, DiT): each block's
    LayerNorm is modulated by a zero-initialized projection of the timestep
    embedding, so the model starts as an identity-like function and trains
    stably without warmup tricks.
  * Static shapes end to end; the module drops into ``GaussianDiffusion``
    unchanged (same ``(B, H, D) x (B,) -> (B, H, D)`` contract and
    ``init_params`` helper as ``TemporalUnet``), so every sampler, policy,
    loss, trainer, and mesh sharding in the framework works with it as-is.
  * Unlike the U-Net there is no horizon divisibility constraint
    (``2**(levels-1)``) — any horizon works.

Interface parity with TemporalUnet: ``transition_dim``, ``dim``, ``dtype``,
``act_spec`` (activation sharding: batch/horizon/channel mesh axes), and
``init_params(rng, horizon, batch_size)``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dadiff_tpu.models.temporal_unet import SinusoidalPosEmb, mish


class AdaLNBlock(nn.Module):
    """Pre-LN transformer block with adaLN-Zero timestep modulation.

    ``t_emb -> Dense(6*dim, zero-init)`` produces per-block
    (shift, scale, gate) pairs for the attention and MLP branches; zero
    init makes both branches start closed (output = input at t=0 of
    training), the DiT recipe that removes the need for LR warmup hacks.
    """

    dim: int
    n_heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array) -> jax.Array:
        mod = nn.Dense(
            6 * self.dim,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaln_mod",
        )(nn.silu(t_emb))
        (s1, g1, gate1, s2, g2, gate2) = jnp.split(mod[:, None, :], 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        h = h * (1.0 + g1) + s1
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.dim,
            out_features=self.dim,
            dtype=self.dtype,
            name="attn",
        )(h, h)
        x = x + gate1 * h

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        h = h * (1.0 + g2) + s2
        h = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype, name="mlp1")(h)
        h = mish(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(h)
        return x + gate2 * h


class TemporalTransformer(nn.Module):
    """Timestep-conditioned transformer over the horizon axis.

    Input/output ``(batch, horizon, transition_dim)``; any horizon (no
    power-of-two constraint). Defaults sized so dim=128/depth=4 is in the
    same parameter band as the dim=128 mults 1-2-4 U-Net.
    """

    transition_dim: int
    dim: int = 128
    depth: int = 4
    n_heads: int = 4
    mlp_ratio: int = 4
    time_dim: Optional[int] = None
    max_horizon: int = 512
    dtype: jnp.dtype = jnp.float32
    # Optional (batch, horizon, channels) mesh-axis names, as in TemporalUnet.
    act_spec: Optional[Tuple[Optional[str], ...]] = None

    # U-Net config-surface compat: checkpoints/configs that record dim_mults
    # read () for transformers (utils/training.Trainer._config_dict).
    @property
    def dim_mults(self) -> Tuple[int, ...]:
        return ()

    def _constrain(self, x: jax.Array) -> jax.Array:
        if self.act_spec is None:
            return x
        from dadiff_tpu.parallel.tp import maybe_constrain

        return maybe_constrain(x, self.act_spec)

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array) -> jax.Array:
        horizon = x.shape[1]
        time_dim = self.time_dim or self.dim

        # Same timestep-MLP shape as the U-Net (sin emb -> 4x -> mish -> 1x).
        t = SinusoidalPosEmb(self.dim, name="time_pos_emb")(time)
        t = nn.Dense(time_dim * 4, dtype=self.dtype, name="time_dense1")(t)
        t = mish(t)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_dense2")(t)

        pos_table = self.param(
            "pos_emb",
            nn.initializers.normal(stddev=0.02),
            (self.max_horizon, self.dim),
            jnp.float32,
        )
        h = nn.Dense(self.dim, dtype=self.dtype, name="in_proj")(
            x.astype(self.dtype)
        )
        h = h + pos_table[None, :horizon, :].astype(self.dtype)
        h = self._constrain(h)

        for i in range(self.depth):
            h = AdaLNBlock(
                dim=self.dim,
                n_heads=self.n_heads,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, t)
            h = self._constrain(h)

        # Final adaLN + zero-init projection back to transition_dim
        # (DiT final layer): the denoiser starts by predicting zeros.
        mod = nn.Dense(
            2 * self.dim,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="final_mod",
        )(nn.silu(t))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(h)
        h = h * (1.0 + scale) + shift
        out = nn.Dense(
            self.transition_dim,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(h)
        return out.astype(jnp.float32)

    def init_params(self, rng: jax.Array, horizon: int, batch_size: int = 1):
        """Convenience initializer returning a params pytree."""
        x = jnp.zeros((batch_size, horizon, self.transition_dim), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.int32)
        return self.init(rng, x, t)["params"]
