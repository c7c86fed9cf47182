"""Parallel-in-time sampling: Jacobi/Picard iteration over the reverse chain.

Technique from "Parallel Sampling of Diffusion Models" (Shih et al., 2023,
arXiv:2305.16317): with the per-step noise fixed, ancestral sampling is a
deterministic composition x_{i+1} = f_i(x_i). Instead of T sequential model
calls, iterate the whole chain as a fixed point:

    X^{k+1}[i+1] = f_i(X^k[i])   for all i in parallel

Each sweep evaluates the denoiser at ALL timesteps as one batched forward —
on TPU the (T*B)-batched call costs a small multiple of a batch-B call (the
MXU is idle at planning batch sizes) — and the iteration converges in far
fewer sweeps than T. At tolerance 0 it reproduces the sequential sampler
exactly (tests/test_parallel_sampling.py).

This is a TPU-native capability with no reference counterpart: the
reference's host-driven loop (diffusion.py:247-249) cannot batch over time.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dadiff_tpu.models.diffusion import p_mean_variance, default_timesteps
from dadiff_tpu.ops.schedules import DiffusionSchedule


def parallel_sample_loop(
    apply_fn,
    params,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: Tuple[int, ...],
    *,
    sampling_timesteps: Optional[int] = None,
    window: int = 16,
    tol: float = 1e-2,
    max_sweeps: Optional[int] = None,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
    init_noise: Optional[jax.Array] = None,
    step_noise: Optional[jax.Array] = None,
    return_sweeps: bool = False,
    time_shard_axis: Optional[str] = None,
):
    """Sliding-window Picard iteration (ParaDiGMS-style).

    A window of ``window`` consecutive timesteps is iterated in parallel
    (one (window*B)-batched model call per sweep) in the *integral form*:

        X[i+1] = X[s] + sum_{j=s..i} d_j(X[j]),   d_j(x) = f_j(x) - x

    so one sweep propagates drift information across the whole window (the
    recursion form would only move the wavefront one position per sweep).
    Per-position convergence is checked with ``tol``; the window start
    advances past every leading converged position each sweep — typically
    several at once — so the number of *sequential* model calls drops well
    below T while staying within tol of the exact chain.

    Args:
        window: timesteps iterated in parallel per sweep.
        tol: per-position max-abs iterate-change threshold.
        max_sweeps: sweep cap (default 2*T, a loose exactness backstop).
        return_sweeps: also return the number of sweeps (sequential model
            calls) used.
        time_shard_axis: mesh axis name to shard the (window*batch)-flattened
            model call over — time-axis model parallelism, the diffusion
            serving analog of pipeline parallelism: each sweep's W-timestep
            denoiser call is divided across devices, cutting batch-1 latency
            by up to the mesh-axis size. Requires tracing under an ambient
            mesh (``jax.set_mesh``) whose axis divides window*batch; no-op
            otherwise (parallel/tp.py::maybe_constrain).
    """
    ts = default_timesteps(schedule.n_timesteps, sampling_timesteps)
    T = int(ts.shape[0])
    batch = shape[0]
    W = min(window, T)
    if max_sweeps is None:
        max_sweeps = 2 * T

    rng, init_key, noise_key = jax.random.split(rng, 3)
    x_init = jax.random.normal(init_key, shape) if init_noise is None else init_noise
    if step_noise is None:
        step_noise = jax.random.normal(noise_key, (T,) + shape)

    # X[i] = iterate of the state BEFORE applying step i; X[T] = final sample.
    # Buffer padded by W so windowed dynamic reads/writes never hit XLA's
    # start-index clamping (which would silently shift the write).
    X0 = jnp.broadcast_to(x_init[None], (T + 1 + W,) + shape)
    ts_pad = jnp.concatenate([ts, jnp.zeros((W,), jnp.int32)])
    noise_pad = jnp.concatenate([step_noise, jnp.zeros((W,) + shape)], axis=0)

    def body(carry):
        X, s, sweeps = carry
        # window of inputs X[s : s+W] applied at steps ts[s : s+W]
        x_win = lax.dynamic_slice_in_dim(X, s, W, axis=0)  # (W, B, H, D)
        t_win = lax.dynamic_slice_in_dim(ts_pad, s, W, axis=0)
        n_win = lax.dynamic_slice_in_dim(noise_pad, s, W, axis=0)

        x_flat = x_win.reshape((W * batch,) + shape[1:])
        t_flat = jnp.repeat(t_win, batch)
        if time_shard_axis is not None:
            from dadiff_tpu.parallel.tp import maybe_constrain

            x_flat = maybe_constrain(
                x_flat, (time_shard_axis,) + (None,) * (len(shape) - 1)
            )
            t_flat = maybe_constrain(t_flat, (time_shard_axis,))
        model_out = apply_fn(params, x_flat, t_flat)
        mean, log_var = p_mean_variance(
            model_out, schedule, x_flat, t_flat,
            clip_denoised=clip_denoised, predict_epsilon=predict_epsilon,
        )
        nonzero = (t_flat != 0).astype(jnp.float32).reshape(
            (W * batch,) + (1,) * (len(shape) - 1)
        )
        stepped = (mean + nonzero * jnp.exp(0.5 * log_var)
                   * n_win.reshape((W * batch,) + shape[1:])).reshape((W,) + shape)

        # integral (Picard) update: anchor at the converged prefix state and
        # accumulate drifts d_j = f_j(X[j]) - X[j] across the window
        drift = stepped - x_win
        anchor = X[s] if isinstance(s, int) else lax.dynamic_index_in_dim(
            X, s, axis=0, keepdims=False
        )
        new = anchor[None] + jnp.cumsum(drift, axis=0)

        old = lax.dynamic_slice_in_dim(X, s + 1, W, axis=0)
        delta = jnp.max(jnp.abs(new - old).reshape(W, -1), axis=1)  # (W,)
        # positions beyond the chain are vacuously converged
        pos = s + 1 + jnp.arange(W)
        delta = jnp.where(pos <= T, delta, 0.0)

        X = lax.dynamic_update_slice_in_dim(
            X, jnp.where((pos <= T)[:, None, None, None], new, old), s + 1, axis=0
        )
        # advance past leading converged positions (always >= 0; the head
        # position converges after its input is final, so progress is
        # guaranteed within two sweeps per position worst-case)
        leading = jnp.cumprod((delta < tol).astype(jnp.int32))
        n_adv = jnp.sum(leading)
        return X, jnp.minimum(s + n_adv, T), sweeps + 1

    def cond(carry):
        _, s, sweeps = carry
        return jnp.logical_and(s < T, sweeps < max_sweeps)

    X, _, sweeps = lax.while_loop(cond, body, (X0, jnp.asarray(0), jnp.asarray(0)))
    out = X[T]
    if return_sweeps:
        return out, sweeps
    return out
