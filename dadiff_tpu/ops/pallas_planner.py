"""Batched best-of-N planning megakernel: the PRODUCTION sampling path —
conditioning + per-step dynamics projection + N candidates — as one Pallas
kernel.

Round 2's whole-chain megakernel (ops/pallas_unet.py) ran only the batch-1
unguided chain, so the bench headline measured a path the quality evals
never used. This module closes that gap: candidates (and episode streams)
are row-stacked into one (N*H, D) block so every conv matmul runs at
N*H >= 256 rows (full MXU tiles instead of batch-1's 32), and the
dynamics-aware projection runs INSIDE the kernel each step.

The projection trick: apply_projection (ops/projection.py) — unnormalize ->
concatenated layout -> x @ P -> blend -> renormalize — is AFFINE in the
normalized interleaved trajectory (every stage is affine and the blend is a
convex combination, which affine maps commute with). So the whole pipeline
collapses to ONE precomputed interleaved-space matrix M (H*D, H*D) plus an
offset b, built numerically from apply_projection itself on basis
trajectories (exact by construction). In-kernel: flatten the row-stacked
chains to (N, H*D) with a chain-selector matmul, one MXU matmul x @ M + b,
blend by the per-step alpha, scatter back with the transposed selector.
Wall-aware reverts (the Medium/Large win) compose as an unrolled
static-wall-cell mask over the projected positions.

Semantics mirror guides/sampling.make_sampler's DDPM body exactly
(projection applied to x_next, conditions re-imposed after every step);
equivalence is tested in interpret mode (tests/test_pallas_planner.py).
Replaces (semantically) the reference's host-driven candidate loop — which
does not exist: the reference samples batch=1 per replan
(m_diffuser/guides/policies.py:217) and never calls its projection.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.schedules import DiffusionSchedule
from dadiff_tpu.ops.pallas_unet import (
    _layer_plan,
    _unet_forward,
    flatten_unet_params,
    prepare_chain_operands,
)
from dadiff_tpu.ops.projection import NormStats, apply_projection


def build_interleaved_projection(
    P: jax.Array,
    stats: NormStats,
    *,
    observation_dim: int,
    action_dim: int,
    state_dim: int,
    horizon: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Collapse the full apply_projection pipeline (alpha=1, no wall mask)
    into one interleaved-space affine map: project(x) == x_flat @ M + b.

    Built numerically from apply_projection itself on the standard basis —
    exact because the pipeline is affine (see module docstring); a property
    test pins this (tests/test_pallas_planner.py). Returns float64-built
    float32 (M, b) with M of shape (H*D, H*D), b of shape (H*D,).
    """
    D = observation_dim + action_dim
    HD = horizon * D

    def f(x_flat):
        x = x_flat.reshape(-1, horizon, D)
        out = apply_projection(
            x, P, jnp.asarray(1.0), stats,
            observation_dim=observation_dim,
            action_dim=action_dim,
            state_dim=state_dim,
        )
        return out.reshape(-1, HD)

    eye = jnp.eye(HD, dtype=jnp.float32)
    b = np.asarray(f(jnp.zeros((1, HD), jnp.float32)))[0]
    M = np.asarray(f(eye)) - b[None, :]
    return M.astype(np.float32), b.astype(np.float32)


def _wall_cells_from_grid(wall_grid) -> Tuple[Tuple[int, int], ...]:
    g = np.asarray(wall_grid)
    rows, cols = np.nonzero(g == 1)
    return tuple((int(r), int(c)) for r, c in zip(rows, cols))


def make_pallas_planner_chain(
    unet: TemporalUnet,
    schedule: DiffusionSchedule,
    horizon: int,
    n_chains: int,
    n_groups: int,
    *,
    sampling_timesteps: Optional[int] = None,
    clip_denoised: bool = True,
    predict_epsilon: bool = True,
    projection: bool = False,
    wall_grid=None,
    wall_margin: Optional[float] = None,
    pos_stats: Optional[Tuple[Tuple[float, float], Tuple[float, float]]] = None,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Build the batched planning chain kernel.

    ``chain(flat_w, x0, m_embs, step_noise, scal, cond[, M, b]) -> x`` runs
    ``n_groups * n_chains`` independent reverse chains; each group's
    ``n_chains`` chains are row-stacked in VMEM ((n_chains*H, D) per grid
    step) and groups iterate as the major grid axis (grid = (G, T), weights
    staying VMEM-resident across the whole grid).

    Operand layout (R = n_groups * n_chains * horizon rows total):
      x0         (R, D)      initial noise
      m_embs     (T, 1, time_dim)
      step_noise (T, R, D)
      scal       (T, 1, 8)   lanes: recip, recipm1, c1, c2, sigma, alpha
      cond       (R, D)      per-chain conditioning values (row 0 used)
      M, b       (H*D, H*D), (1, H*D)  interleaved projection (if projection)

    ``pos_stats``: ((mean_x, mean_y), (std_x, std_y)) physical-position
    normalizer stats, baked static for the wall-aware revert.
    """
    from dadiff_tpu.models.diffusion import default_timesteps

    ts = default_timesteps(schedule.n_timesteps, sampling_timesteps)
    T = int(ts.shape[0])
    D = unet.transition_dim
    H = horizon
    N = n_chains
    G = n_groups
    NH = N * H
    HD = H * D
    ops, entries = _layer_plan(unet)
    n_weights = len(entries)
    compute_dtype = weight_dtype
    wall_cells = (
        _wall_cells_from_grid(wall_grid) if wall_grid is not None else None
    )
    if wall_cells is not None:
        grid_hw = np.asarray(wall_grid).shape
        if pos_stats is None:
            raise ValueError("wall-aware kernel needs pos_stats")

    def _apply_cond(x, cond):
        row = jax.lax.broadcasted_iota(jnp.int32, (NH, D), 0)
        return jnp.where(row % H == 0, cond, x)

    def _project(x, alpha, M, b):
        """alpha * (x_flat @ M + b) + (1-alpha) * x, on row-stacked chains."""
        ridx = jax.lax.broadcasted_iota(jnp.int32, (NH, D), 0) % H
        X_bd = jnp.concatenate(
            [jnp.where(ridx == h, x, 0.0) for h in range(H)], axis=1
        )  # (NH, HD): row r holds x[r] at lane block (r % H)
        rr = jax.lax.broadcasted_iota(jnp.int32, (NH, N), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (NH, N), 1)
        Csel = (rr // H == cc).astype(jnp.float32)
        x_flat = jax.lax.dot_general(
            Csel, X_bd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, HD)
        z = jax.lax.dot_general(
            x_flat, M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        xp_flat = alpha * z + (1.0 - alpha) * x_flat
        X_bd2 = jax.lax.dot_general(
            Csel, xp_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NH, HD)
        xp = jnp.zeros_like(x)
        for h in range(H):
            xp = xp + jnp.where(ridx == h, X_bd2[:, h * D:(h + 1) * D], 0.0)
        if wall_cells is not None:
            (mx, my), (sx, sy) = pos_stats
            px = xp[:, 0:1] * sx + mx
            py = xp[:, 1:2] * sy + my
            Hm, Wm = grid_hw
            probes = [(0.0, 0.0)]
            if wall_margin:
                probes = [
                    (dx, dy)
                    for dx in (-wall_margin, wall_margin)
                    for dy in (-wall_margin, wall_margin)
                ]
            bad = jnp.zeros((NH, 1), bool)
            for dx, dy in probes:
                col = jnp.clip(
                    jnp.floor(px + dx + Wm / 2.0).astype(jnp.int32), 0, Wm - 1
                )
                row = jnp.clip(
                    jnp.floor(Hm / 2.0 - (py + dy)).astype(jnp.int32), 0, Hm - 1
                )
                for (wr, wc) in wall_cells:
                    bad = bad | ((row == wr) & (col == wc))
            xp = jnp.where(bad, x, xp)
        return xp

    def kernel(*refs):
        wrefs = refs[:n_weights]
        rest = list(refs[n_weights:])
        x0_ref = rest.pop(0)
        memb_ref = rest.pop(0)   # (1, 1, time_dim)
        noise_ref = rest.pop(0)  # (1, NH, D)
        scal_ref = rest.pop(0)   # (1, 1, 8)
        cond_ref = rest.pop(0)   # (NH, D)
        M_ref = rest.pop(0) if projection else None
        b_ref = rest.pop(0) if projection else None
        out_ref = rest.pop(0)
        x_ref = rest.pop(0)

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            x_ref[:] = _apply_cond(x0_ref[:], cond_ref[:])

        x = x_ref[:]
        eps_out = _unet_forward(
            x, memb_ref[0], wrefs, ops, compute_dtype, n_chains=N
        )

        recip = scal_ref[0, 0, 0]
        recipm1 = scal_ref[0, 0, 1]
        c1 = scal_ref[0, 0, 2]
        c2 = scal_ref[0, 0, 3]
        sigma = scal_ref[0, 0, 4]
        alpha = scal_ref[0, 0, 5]

        if predict_epsilon:
            x_recon = recip * x - recipm1 * eps_out
        else:
            x_recon = eps_out
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        x_next = c1 * x_recon + c2 * x + sigma * noise_ref[0]

        if projection:
            x_next = _project(x_next, alpha, M_ref[:], b_ref[:])
        x_next = _apply_cond(x_next, cond_ref[:])

        x_ref[:] = x_next
        out_ref[:] = x_next

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)]
    time_dim = unet.time_dim or unet.dim
    in_specs = w_specs + [
        pl.BlockSpec((NH, D), lambda g, t: (g, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, time_dim), lambda g, t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NH, D), lambda g, t: (t, g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8), lambda g, t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NH, D), lambda g, t: (g, 0), memory_space=pltpu.VMEM),
    ]
    if projection:
        in_specs += [
            pl.BlockSpec((HD, HD), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    def chain(flat_w, x0, m_embs, step_noise, scal, cond, M=None, b=None):
        args = list(flat_w) + [
            x0, m_embs[:, None, :], step_noise, scal[:, None, :], cond,
        ]
        if projection:
            args += [M, b.reshape(1, HD)]
        # scoped-VMEM stack grows ~0.53 MB per stacked chain (live conv
        # stacks + the projection's block-diagonal spread); the default
        # 16 MB limit caps ~24 chains — raise it (v5e has 128 MB VMEM and
        # the bf16 weights take ~32 MB as inputs)
        compiler_params = None
        if not interpret:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            )
        return pl.pallas_call(
            kernel,
            grid=(G, T),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (NH, D), lambda g, t: (g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((G * NH, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NH, D), jnp.float32)],
            compiler_params=compiler_params,
            interpret=interpret,
        )(*args)

    chain.timesteps = ts
    chain.n_steps = T
    return chain


def make_pallas_bo_sampler(
    diffusion,
    *,
    projection_spec=None,
    P: Optional[jax.Array] = None,
    stats: Optional[NormStats] = None,
    n_candidates: int = 8,
    group_chains: int = 64,
    sampling_timesteps: Optional[int] = None,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Best-of-N planner through the batched megakernel, with the
    make_sampler-compatible surface: ``plan(params, rng, conditions) ->
    (B, H, D)`` best plan per episode stream, selected by the physical-space
    goal-distance scorer (guides/policies.make_goal_distance_scorer
    semantics).

    All candidate chains for all episode streams run in ONE pallas_call
    (grid-major over groups of ``group_chains`` chains). Projection
    (including wall-aware) is baked at build time from (P, stats,
    projection_spec); pass ``projection_spec=None`` for the plain guided
    path.
    """
    from dadiff_tpu.ops.projection import projection_alpha

    unet = diffusion.model
    schedule = diffusion.schedule
    H, D = diffusion.horizon, diffusion.transition_dim
    obs_dim, act_dim = diffusion.observation_dim, diffusion.action_dim
    use_projection = (
        projection_spec is not None and not projection_spec.parity_mode
    )

    M = b = None
    pos_stats = None
    wall_grid = None
    if use_projection:
        if P is None or stats is None:
            raise ValueError("projection needs P and stats at build time")
        Mnp, bnp = build_interleaved_projection(
            jnp.asarray(P), stats,
            observation_dim=obs_dim, action_dim=act_dim,
            state_dim=projection_spec.state_dim, horizon=H,
        )
        M, b = jnp.asarray(Mnp), jnp.asarray(bnp)
        if projection_spec.wall_grid is not None:
            wall_grid = np.asarray(projection_spec.wall_grid)
            pos_stats = (
                (float(stats.obs_mean[0]), float(stats.obs_mean[1])),
                (float(stats.obs_std[0]), float(stats.obs_std[1])),
            )

    chains_cache = {}

    def _get_chain(n_chains, n_groups):
        key = (n_chains, n_groups)
        if key not in chains_cache:
            chains_cache[key] = make_pallas_planner_chain(
                unet, schedule, H, n_chains, n_groups,
                sampling_timesteps=sampling_timesteps,
                clip_denoised=diffusion.clip_denoised,
                predict_epsilon=diffusion.predict_epsilon,
                projection=use_projection,
                wall_grid=wall_grid,
                wall_margin=(
                    projection_spec.wall_margin if use_projection else None
                ),
                pos_stats=pos_stats,
                weight_dtype=weight_dtype,
                interpret=interpret,
            )
        return chains_cache[key]

    # per-step DDPM scalars + projection alpha, precomputed once per params
    def _prepare(params):
        from dadiff_tpu.models.diffusion import default_timesteps

        ts = default_timesteps(schedule.n_timesteps, sampling_timesteps)
        flat_w, m_embs, scal = prepare_chain_operands(
            unet, schedule, params, ts, weight_dtype=weight_dtype
        )
        if use_projection:
            alphas = projection_alpha(
                ts, diffusion.n_timesteps, projection_spec.schedule,
                projection_spec.strength, schedule.betas,
            )
            scal = scal.at[:, 5].set(alphas)
        return flat_w, m_embs, scal

    def plan(params, rng, conditions, prepared=None):
        """``prepared``: optional output of ``plan.prepare(params)`` — pass
        it when planning repeatedly inside one jitted program (e.g. a replan
        scan) so the weight flatten/scalar precompute hoists out of the
        loop body."""
        values, mask = conditions
        if values.ndim == 2:
            values = values[None]
        B = values.shape[0]
        C_tot = B * n_candidates
        Ng = min(group_chains, C_tot)
        G = -(-C_tot // Ng)  # ceil
        C_pad = G * Ng

        flat_w, m_embs, scal = (
            prepared if prepared is not None else _prepare(params)
        )
        T = scal.shape[0]

        init_key, noise_key = jax.random.split(rng)
        x0 = jax.random.normal(init_key, (C_pad * H, D))
        step_noise = jax.random.normal(noise_key, (T, C_pad * H, D))

        cond_rep = jnp.repeat(values, n_candidates, axis=0)  # (C_tot, H, D)
        cond_rep = jnp.concatenate(
            [cond_rep, jnp.zeros((C_pad - C_tot, H, D))], axis=0
        ).reshape(C_pad * H, D)

        chain = _get_chain(Ng, G)
        out = chain(flat_w, x0, m_embs, step_noise, scal, cond_rep, M, b)
        plans = out[: C_tot * H].reshape(B, n_candidates, H, D)

        # physical-space goal-distance selection: final position (obs dims
        # 0:2) and goal (LAST two obs dims), each with its own stat block
        # (make_goal_distance_scorer parity)
        gd = obs_dim - 2
        if stats is not None:
            pos_m, pos_s = stats.obs_mean[:2], stats.obs_std[:2]
            goal_m = stats.obs_mean[gd:obs_dim]
            goal_s = stats.obs_std[gd:obs_dim]
        else:
            pos_m = goal_m = jnp.zeros(2)
            pos_s = goal_s = jnp.ones(2)
        final_pos = plans[:, :, -1, 0:2] * pos_s + pos_m
        goal = values[:, 0, gd:obs_dim] * goal_s + goal_m  # (B, 2)
        d = jnp.linalg.norm(final_pos - goal[:, None, :], axis=-1)  # (B, N)
        best = jnp.argmin(d, axis=1)
        return plans[jnp.arange(B), best]

    plan.uses_projection = use_projection
    plan.prepare = _prepare
    return plan


def wire_policy_megakernel(policy, *, n_candidates: int,
                           group_chains: int = 64, interpret: bool = False):
    """Route a constructed policy's replans through the batched planning
    megakernel: one pallas_call per replan wave (all candidates,
    conditioning, per-step projection, best-of-N selection in-kernel
    semantics). The policy keeps its host logic (buffers, deviation
    replanning, observation processing) — only the sampler call is
    replaced, and candidate selection moves inside the megakernel path, so
    ``policy.n_candidates`` becomes 1.

    Host-protocol quality numbers through this wiring are directly
    comparable to the XLA-sampler headlines (same scorer semantics).
    """
    cfg = getattr(policy, "_sampler_config", None)
    if cfg is None:
        raise ValueError("policy lacks _sampler_config")
    if cfg.get("sampler") != "ddpm":
        raise ValueError("megakernel supports the ddpm sampler only")
    if cfg.get("guide_fn") is not None and cfg.get("guide_weight"):
        raise ValueError("megakernel does not support gradient guidance")
    if cfg.get("warm_start_from") or getattr(policy, "warm_start_auto", False):
        raise ValueError("megakernel does not compose with warm start")

    mega = make_pallas_bo_sampler(
        policy.diffusion,
        projection_spec=cfg.get("projection"),
        P=getattr(policy, "_P", None),
        stats=getattr(policy, "_stats", None),
        n_candidates=n_candidates,
        group_chains=group_chains,
        sampling_timesteps=cfg.get("sampling_timesteps"),
        interpret=interpret,
        weight_dtype=jnp.float32 if interpret else jnp.bfloat16,
    )
    jitted = jax.jit(lambda p, k, c, prep: mega(p, k, c, prepared=prep))
    box = {}

    def plan(params, key, conditions, P=None, stats_=None):
        if "prep" not in box:
            box["prep"] = mega.prepare(params)
        return jitted(params, key, conditions, box["prep"])

    policy._plan = plan
    policy.n_candidates = 1
    policy.megakernel = True
    return policy
