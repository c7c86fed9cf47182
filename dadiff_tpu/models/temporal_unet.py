"""Temporal U-Net denoiser in Flax (TPU-native rebuild of reference
m_diffuser/models/temporal_unet.py:125-241).

Design differences from the reference (deliberate, TPU-first):

  * Feature-last layout ``(batch, horizon, channels)`` end to end — XLA's
    native conv layout on TPU; avoids the reference's transpose dance
    (temporal_unet.py:211,239).
  * Explicit padding pairs so down/upsample alignment is bit-identical to
    torch ``Conv1d(k=3,s=2,p=1)`` / ``ConvTranspose1d(k=4,s=2,p=1)``
    (validated by tests/test_torch_parity.py).
  * A ``dtype`` knob for bfloat16 activations on the MXU, with GroupNorm
    statistics kept in float32.

Architecture parity with the reference (temporal_unet.py:154-197):
time-MLP = SinusoidalPosEmb -> Dense(4*time_dim) -> Mish -> Dense(time_dim);
per-level encoder [ResBlock, ResBlock, Downsample]; 2 mid ResBlocks; decoder
[ResBlock(skip concat), ResBlock, Upsample]; final Conv1dBlock + 1x1 Conv.
No attention blocks (the reference has none).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


def mish(x: jax.Array) -> jax.Array:
    """Mish activation: x * tanh(softplus(x)) (reference uses nn.Mish)."""
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    """Sinusoidal timestep embeddings (reference temporal_unet.py:12-32)."""

    dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half_dim = self.dim // 2
        scale = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(-scale * jnp.arange(half_dim, dtype=jnp.float32))
        emb = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class ConvTranspose1d(nn.Module):
    """Stride-2 transposed conv, exact torch ``ConvTranspose1d(k,s,p)`` semantics.

    Implemented directly on ``lax.conv_transpose`` with
    ``transpose_kernel=True`` and pads ``k-1-p`` per side; kernel stored as
    ``(k, out, in)`` so the torch ``(in, out, k)`` weight maps via a single
    transpose (see dadiff_tpu/io/torch_compat.py).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.features, in_features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = self.kernel_size - 1 - self.padding
        y = lax.conv_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=(self.stride,),
            padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            transpose_kernel=True,
        )
        return y + bias.astype(self.dtype)


class PallasGroupNormMish(nn.Module):
    """GroupNorm+Mish via the fused Pallas kernel (ops/pallas_kernels.py).

    Parameter names/shapes match nn.GroupNorm ('scale'/'bias'), so checkpoints
    are interchangeable with the XLA path.
    """

    n_groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from dadiff_tpu.ops.pallas_kernels import group_norm_mish

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm_mish(x.astype(jnp.float32), scale, bias, self.n_groups)


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm(8) -> Mish (reference temporal_unet.py:57-76).

    GroupNorm statistics run in float32 regardless of activation dtype.
    With ``use_pallas_norm`` the norm+activation run as one fused Pallas
    kernel (same params; TPU-only fast path).
    """

    out_channels: int
    kernel_size: int = 3
    n_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            padding=[(p, p)],
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_pallas_norm:
            x = PallasGroupNormMish(n_groups=self.n_groups, name="norm")(x)
            return x.astype(self.dtype)
        x = nn.GroupNorm(
            num_groups=self.n_groups, epsilon=1e-5, dtype=jnp.float32, name="norm"
        )(x)
        return mish(x).astype(self.dtype)


class ResidualTemporalBlock(nn.Module):
    """Two Conv1dBlocks with a time-embedding add and residual 1x1 conv
    (reference temporal_unet.py:79-122; time add at :117)."""

    out_channels: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32
    use_pallas_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array) -> jax.Array:
        h = Conv1dBlock(
            self.out_channels, self.kernel_size, dtype=self.dtype,
            use_pallas_norm=self.use_pallas_norm, name="block1",
        )(x)
        # time_mlp = Mish -> Dense (reference :97-100)
        te = nn.Dense(self.out_channels, dtype=self.dtype, name="time_dense")(
            mish(t_emb)
        )
        h = h + te[:, None, :]
        h = Conv1dBlock(
            self.out_channels, self.kernel_size, dtype=self.dtype,
            use_pallas_norm=self.use_pallas_norm, name="block2",
        )(h)
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="residual_conv")(x)
        else:
            res = x
        return h + res


class TemporalUnet(nn.Module):
    """1-D conv U-Net over the horizon axis, timestep-conditioned.

    Input/output ``(batch, horizon, transition_dim)``; horizon must be
    divisible by ``2**(len(dim_mults)-1)`` (reference constraint via strided
    convs, temporal_unet.py:35-54).
    """

    transition_dim: int
    dim: int = 128
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    kernel_size: int = 5
    time_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas_norm: bool = False
    # Optional (batch, horizon, channels) mesh-axis names for activation
    # sharding constraints, e.g. ("dp", "sp", "tp"). No-op unless traced
    # under an ambient mesh (jax.set_mesh) containing those axes — see
    # dadiff_tpu/parallel/tp.py.
    act_spec: Optional[Tuple[Optional[str], ...]] = None

    def _constrain(self, x: jax.Array) -> jax.Array:
        if self.act_spec is None:
            return x
        from dadiff_tpu.parallel.tp import maybe_constrain

        return maybe_constrain(x, self.act_spec)

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array) -> jax.Array:
        time_dim = self.time_dim or self.dim

        # Time embedding MLP (reference :154-160).
        t = SinusoidalPosEmb(self.dim, name="time_pos_emb")(time)
        t = nn.Dense(time_dim * 4, dtype=self.dtype, name="time_dense1")(t)
        t = mish(t)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_dense2")(t)

        dims = [self.transition_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_levels = len(in_out)

        x = x.astype(self.dtype)

        # Encoder (reference :167-175, :217-222): skip pushed BEFORE downsample.
        skips = []
        for i, (_, dim_out) in enumerate(in_out):
            x = ResidualTemporalBlock(
                dim_out, self.kernel_size, dtype=self.dtype,
                use_pallas_norm=self.use_pallas_norm, name=f"down_{i}_res1",
            )(x, t)
            x = ResidualTemporalBlock(
                dim_out, self.kernel_size, dtype=self.dtype,
                use_pallas_norm=self.use_pallas_norm, name=f"down_{i}_res2",
            )(x, t)
            x = self._constrain(x)
            skips.append(x)
            if i < n_levels - 1:
                x = nn.Conv(
                    dim_out,
                    (3,),
                    strides=(2,),
                    padding=[(1, 1)],
                    dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(x)
                x = self._constrain(x)

        # Bottleneck (reference :177-180).
        mid_dim = dims[-1]
        x = ResidualTemporalBlock(
            mid_dim, self.kernel_size, dtype=self.dtype,
            use_pallas_norm=self.use_pallas_norm, name="mid_block1",
        )(x, t)
        x = ResidualTemporalBlock(
            mid_dim, self.kernel_size, dtype=self.dtype,
            use_pallas_norm=self.use_pallas_norm, name="mid_block2",
        )(x, t)
        x = self._constrain(x)

        # Decoder (reference :183-191, :229-233): iterates reversed(in_out[1:])
        # so exactly n_levels-1 skips are consumed; every decoder level has an
        # upsample in the reference (its is_last condition never fires).
        for i, (dim_in, _) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResidualTemporalBlock(
                dim_in, self.kernel_size, dtype=self.dtype,
                use_pallas_norm=self.use_pallas_norm, name=f"up_{i}_res1",
            )(x, t)
            x = ResidualTemporalBlock(
                dim_in, self.kernel_size, dtype=self.dtype,
                use_pallas_norm=self.use_pallas_norm, name=f"up_{i}_res2",
            )(x, t)
            x = self._constrain(x)
            x = ConvTranspose1d(dim_in, dtype=self.dtype, name=f"up_{i}_upsample")(x)
            x = self._constrain(x)

        # Final head (reference :194-197).
        x = Conv1dBlock(
            self.dim, self.kernel_size, dtype=self.dtype,
            use_pallas_norm=self.use_pallas_norm, name="final_block",
        )(x)
        x = nn.Conv(self.transition_dim, (1,), dtype=self.dtype, name="final_conv")(x)
        return x.astype(jnp.float32)

    def init_params(self, rng: jax.Array, horizon: int, batch_size: int = 1):
        """Convenience initializer returning a params pytree."""
        x = jnp.zeros((batch_size, horizon, self.transition_dim), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.int32)
        return self.init(rng, x, t)["params"]
