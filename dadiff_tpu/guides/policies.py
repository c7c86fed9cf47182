"""Env-facing planning policies (reference: m_diffuser/guides/policies.py).

Each policy wraps the jitted sampling engine (guides/sampling.py) behind the
reference's stateful ``get_action(obs) -> np.ndarray`` API with action
buffering / MPC replanning. All heavy compute is one compiled plan call per
replan; the host only flattens observations and pops the buffer.

Differences from the reference (deliberate):
  * parameters are explicit (``params`` argument) — JAX-idiomatic,
  * ``DynamicsAwarePolicy`` actually projects during sampling (the reference
    defines but never invokes ``apply_projection``; SURVEY.md §2.3 #3) —
    pass ``parity_mode=True`` to reproduce the reference's as-implemented
    no-projection sampling,
  * safe sampling-step truncation instead of the unsafe ``n_timesteps``
    overwrite (evaluate.py:352).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dadiff_tpu.datasets.sources import flatten_observation
from dadiff_tpu.guides.sampling import (
    ProjectionSpec,
    conditions_for_initial_obs_np,
    make_sampler,
)
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.ops.projection import NormStats


def goal_distance_scorer(trajs: jax.Array, normed_obs: jax.Array) -> jax.Array:
    """Normalized-space goal-distance scorer: distance between the plan's
    final position (obs dims 0:2) and the goal (last two obs dims of the
    conditioned observation, the layout of sources.flatten_observation).

    CAVEAT: position dims and goal dims are normalized with *different*
    stat blocks (goals cluster at cells), so this is only monotone in
    physical distance when the two blocks happen to match. Prefer
    :func:`make_goal_distance_scorer` (the policy default when a normalizer
    is available), which compares in physical space."""
    obs_dim = normed_obs.shape[-1]
    goal = normed_obs[obs_dim - 2 : obs_dim]
    final_pos = trajs[:, -1, 0:2]
    return jnp.linalg.norm(final_pos - goal[None], axis=-1)


def make_goal_distance_scorer(obs_mean, obs_std):
    """Physical-space goal-distance scorer: unnormalizes the plan's final
    position (obs dims 0:2) and the goal (last two obs dims) with their own
    normalizer stat blocks before comparing. This is the correct metric —
    position and goal stats generally differ, so the normalized-space
    distance can prefer plans that end physically farther from the goal."""
    obs_mean = jnp.asarray(obs_mean, jnp.float32)
    obs_std = jnp.asarray(obs_std, jnp.float32)

    def scorer(trajs: jax.Array, normed_obs: jax.Array) -> jax.Array:
        obs_dim = normed_obs.shape[-1]
        final_pos = trajs[:, -1, 0:2] * obs_std[0:2] + obs_mean[0:2]
        goal = (
            normed_obs[obs_dim - 2 : obs_dim] * obs_std[obs_dim - 2 : obs_dim]
            + obs_mean[obs_dim - 2 : obs_dim]
        )
        return jnp.linalg.norm(final_pos - goal[None], axis=-1)

    return scorer


def make_wall_penalty_scorer(
    obs_mean, obs_std, wall_grid, penalty: float = 5.0,
    margin: Optional[float] = None,
):
    """Goal-distance scorer with a wall-collision penalty.

    Best-of-N selection by final goal distance alone systematically prefers
    plans that cut *through* walls — the shortest path ignores obstacles, and
    in wall-dense mazes the scorer then keeps exactly the candidates that
    cannot be executed. This scorer adds ``penalty`` x (fraction of plan rows
    whose physical position lies inside a wall cell, via
    ops/projection.wall_violation_mask), so among near-goal candidates the
    executable one wins. No reference counterpart (the reference has no
    candidate selection at all — its eval samples batch_size=1,
    /root/reference/m_diffuser/guides/policies.py:217).
    """
    from dadiff_tpu.ops.projection import wall_violation_mask

    base = make_goal_distance_scorer(obs_mean, obs_std)
    grid = jnp.asarray(wall_grid, jnp.int32)
    mean2 = jnp.asarray(obs_mean, jnp.float32)[0:2]
    std2 = jnp.asarray(obs_std, jnp.float32)[0:2]

    def scorer(trajs: jax.Array, normed_obs: jax.Array) -> jax.Array:
        pos = trajs[:, :, 0:2] * std2 + mean2  # (N, H, 2) physical xy
        bad = wall_violation_mask(pos, grid, margin=margin)  # (N, H)
        return base(trajs, normed_obs) + penalty * jnp.mean(
            bad.astype(jnp.float32), axis=-1
        )

    return scorer


def make_velocity_scorer(vel_index: int):
    """Best-of-N scorer for locomotion: negative mean planned forward
    velocity over the horizon (lower score = faster plan). ``vel_index`` is
    the observation component holding the root x velocity — 8 for
    HalfCheetah-v5/Walker2d-v5, 5 for Hopper-v5 (gymnasium v5 layouts,
    exclude_current_positions=True). Normalized space is monotone in
    physical velocity for affine normalizers with positive scale."""

    def scorer(trajs: jax.Array, normed_obs: jax.Array) -> jax.Array:
        return -jnp.mean(trajs[:, :, vel_index], axis=-1)

    return scorer


VELOCITY_INDEX = {"halfcheetah": 8, "hopper": 5, "walker": 8}


def velocity_scorer_for_env(env_name: str):
    key = env_name.lower()
    for name, idx in VELOCITY_INDEX.items():
        if name in key:
            return make_velocity_scorer(idx)
    raise ValueError(f"No velocity scorer for {env_name}")


class GuidedPolicy:
    """Base guided-sampling policy with conditioning and action buffering
    (reference policies.py:13-223)."""

    def __init__(
        self,
        diffusion: GaussianDiffusion,
        normalizer,
        params=None,
        guide_fn: Optional[Callable] = None,
        guide_weight: float = 1.0,
        action_horizon: Optional[int] = None,
        sampling_timesteps: Optional[int] = None,
        seed: int = 0,
        projection: Optional[ProjectionSpec] = None,
        skip_conditioned_action: bool = False,
        n_candidates: int = 1,
        candidate_scorer: Optional[Callable] = None,
        sampler: str = "ddpm",
        ddim_eta: float = 0.0,
        inverse_dynamics: Optional[Callable] = None,
        track_planned_states: bool = False,
        warm_start_t: Optional[int] = None,
        warm_start_auto: bool = False,
        warm_auto_scale: float = 4.0,
        replan_deviation: Optional[float] = None,
    ):
        self.diffusion = diffusion
        self.normalizer = normalizer
        # commit params to device once: host-numpy params would re-upload the
        # full weight set on every replan (seconds each on tunneled TPUs)
        self.params = jax.device_put(params) if params is not None else None
        self.guide_fn = guide_fn
        self.guide_weight = guide_weight

        self.horizon = diffusion.horizon
        self.observation_dim = diffusion.observation_dim
        self.action_dim = diffusion.action_dim
        self.transition_dim = diffusion.transition_dim

        # Action buffering / rolling-horizon MPC (reference :44-46)
        self.action_horizon = action_horizon if action_horizon is not None else 1
        self.action_buffer: List[np.ndarray] = []
        # Reference quirk (policies.py:181-191): the buffer starts at t=0,
        # whose action was zeroed by conditioning — so the first executed
        # action of every replan is the dataset-mean action. True by default
        # for parity; set skip_conditioned_action=True to start at t=1.
        self.skip_conditioned_action = skip_conditioned_action
        # Decision-Diffuser-style action extraction: derive each action from
        # consecutive PLANNED STATES via a learned inverse-dynamics model
        # a_t = g(s_t, s_{t+1}) (physical space), instead of executing the
        # plan's action columns. Far more robust for locomotion, where
        # executing smoothed planned actions open-loop drifts.
        self.inverse_dynamics = inverse_dynamics
        # CLOSED-LOOP state tracking (execution-side lever; no reference
        # counterpart): instead of committing to actions at plan time, buffer
        # the planned STATE rows and compute each action at execution time
        # from the OBSERVED state, u_t = g(s_obs, s_plan_{t+1}). Drift within
        # an action chunk is corrected toward the planned trajectory without
        # paying a replan — the open-loop chunk-execution gap the round-3
        # DAgger diagnosis isolated is exactly what this removes.
        if track_planned_states and inverse_dynamics is None:
            raise ValueError("track_planned_states needs inverse_dynamics")
        self.track_planned_states = track_planned_states

        self._rng = jax.random.PRNGKey(seed)
        # full sampler build config, exposed so the micro-batching server
        # (dadiff_tpu/serving.py) can rebuild/vmap the identical sampler
        self._sampler_config = dict(
            diffusion=diffusion,
            guide_fn=guide_fn,
            guide_weight=guide_weight,
            projection=projection,
            sampling_timesteps=sampling_timesteps,
            sampler=sampler,
            ddim_eta=ddim_eta,
            warm_start_from=warm_start_t,
        )
        self._plan = make_sampler(
            diffusion,
            guide_fn=guide_fn,
            guide_weight=guide_weight,
            projection=projection,
            sampling_timesteps=sampling_timesteps,
            sampler=sampler,
            ddim_eta=ddim_eta,
        )
        # Receding-horizon warm start: after the first (full-chain) plan of an
        # episode, replans re-noise the previous plan — shifted by the actions
        # executed since — to timestep warm_start_t and denoise only that
        # suffix (~n_timesteps/warm_start_t fewer model calls per replan,
        # temporally consistent plans). New capability vs the reference.
        self.warm_start_t = warm_start_t
        self._plan_warm = (
            make_sampler(
                diffusion,
                guide_fn=guide_fn,
                guide_weight=guide_weight,
                projection=projection,
                sampling_timesteps=sampling_timesteps,
                sampler=sampler,
                ddim_eta=ddim_eta,
                warm_start_from=warm_start_t,
            )
            if warm_start_t is not None
            else None
        )
        # Adaptive warm depth (no flag to tune per task): pick the replan's
        # re-noise depth K from the MEASURED drift between the executed
        # observation and the plan row it should be on. Principle: the
        # q_sample re-noise must inject at least as much per-dim noise as
        # the observed per-dim drift, or the shallow chain anchors to a
        # stale plan it cannot correct — pick the smallest K (grid of 10)
        # with sqrt(1 - alphas_cumprod[K-1]) >= warm_auto_scale * drift /
        # sqrt(obs_dim), falling back to the full chain when even K=T
        # cannot cover the drift (exactly the regime where round 2 measured
        # warm start collapsing: RESULTS.md locomotion caveat).
        if warm_start_auto and warm_start_t is not None:
            raise ValueError("pass either warm_start_t or warm_start_auto")
        self.warm_start_auto = warm_start_auto
        self.warm_auto_scale = float(warm_auto_scale)
        self._warm_sigmas = np.sqrt(
            1.0 - np.asarray(diffusion.schedule.alphas_cumprod)
        )
        self._warm_cache: dict = {}
        self._warm_enabled = warm_start_t is not None or warm_start_auto
        self.last_warm_k: Optional[int] = None  # introspection/telemetry
        self._last_plan: Optional[np.ndarray] = None  # normalized (1, H, D)
        self._actions_taken = 0  # env steps executed since _last_plan
        # Deviation-triggered replanning (standard MPC practice; no reference
        # counterpart): drop the remaining buffer and replan early when the
        # executed observation drifts more than this L2 distance (normalized
        # space, full obs) from the plan row it should be on. None = fixed
        # cadence (replan only when the buffer drains).
        self.replan_deviation = replan_deviation
        self._planned_obs: List[np.ndarray] = []  # normalized rows, buffer-aligned
        # Best-of-N candidate planning: sample n_candidates plans in one
        # batched call (near-free on the MXU) and keep the best under
        # candidate_scorer (lower is better). New serving capability with no
        # reference counterpart (its eval runs batch_size=1, policies.py:217).
        self.n_candidates = max(1, n_candidates)
        if candidate_scorer is not None:
            self.candidate_scorer = candidate_scorer
        elif normalizer is not None:
            self.candidate_scorer = make_goal_distance_scorer(
                normalizer.obs_mean, normalizer.obs_std
            )
        else:
            self.candidate_scorer = goal_distance_scorer
        # Subclasses may set these (device copies used by the sampler)
        self._P = None
        self._stats = None

    # -- observation handling (reference policies.py:151-179) ----------------
    def _process_observation(self, observation) -> np.ndarray:
        if isinstance(observation, dict):
            if "observation" in observation and "desired_goal" in observation:
                state = np.ravel(observation["observation"])
                goal = np.ravel(observation["desired_goal"])
                expected = self.normalizer.obs_mean.shape[0]
                if expected == len(state) + len(goal):
                    observation = np.concatenate([state, goal])
                else:
                    observation = state
            else:
                observation = flatten_observation(observation)
        observation = np.asarray(observation, dtype=np.float32)
        return observation.reshape(1, -1)

    # -- planning -------------------------------------------------------------
    def plan(self, observation) -> np.ndarray:
        """Run one full guided reverse-diffusion plan from the current
        observation (best of ``n_candidates`` batched samples).
        Returns the normalized trajectory (1, H, D)."""
        obs = self._process_observation(observation)
        normed_obs = self.normalizer.normalize_observations(obs)
        n = self.n_candidates
        tiled = np.repeat(normed_obs, n, axis=0) if n > 1 else normed_obs
        conditions = conditions_for_initial_obs_np(
            tiled, self.observation_dim, self.horizon, self.transition_dim
        )
        self._rng, key = jax.random.split(self._rng)
        x_init = self._warm_init()
        warm_fn = self._plan_warm
        self.last_warm_k = self.warm_start_t if x_init is not None else None
        if x_init is not None and self.warm_start_auto:
            k = self._auto_warm_k(normed_obs)
            self.last_warm_k = k
            if k is None:
                x_init = None  # drift too large: full chain
            else:
                warm_fn = self._auto_warm_sampler(k)
        if x_init is not None:
            # all candidates re-noise the same shifted plan; diversity comes
            # from the per-candidate q_sample noise
            trajs = warm_fn(
                self.params, key, conditions, self._P, self._stats,
                x_init=x_init,
            )
        else:
            trajs = self._plan(self.params, key, conditions, self._P, self._stats)
        if n > 1:
            scores = self.candidate_scorer(trajs, jnp.asarray(normed_obs[0]))
            trajs = trajs[jnp.argmin(scores)][None]
        trajs = np.asarray(trajs)
        if self._warm_enabled:
            self._last_plan = trajs
            self._actions_taken = 0
        return trajs

    def _k_from_drift(self, drift: float) -> Optional[int]:
        """Drift-matched warm depth (grid of 10), or None for the full
        chain. See the __init__ comment for the rule."""
        target = self.warm_auto_scale * drift / np.sqrt(self.observation_dim)
        T = len(self._warm_sigmas)
        for k in range(10, T, 10):
            if self._warm_sigmas[k - 1] >= target:
                return k
        return None

    def _auto_warm_k(self, normed_obs) -> Optional[int]:
        shift = min(self._actions_taken, self.horizon - 1)
        row = self._last_plan[0][shift, : self.observation_dim]
        drift = float(np.linalg.norm(np.ravel(normed_obs) - row))
        return self._k_from_drift(drift)

    def _auto_warm_sampler(self, k: int):
        if k not in self._warm_cache:
            cfg = dict(self._sampler_config)
            cfg["warm_start_from"] = k
            self._warm_cache[k] = make_sampler(**cfg)
        return self._warm_cache[k]

    def _warm_init(self) -> Optional[np.ndarray]:
        """Previous plan shifted by the executed steps (tail-padded with its
        last row), or None when warm start is off / unusable (first replan of
        an episode, or the plan is fully stale)."""
        if not self._warm_enabled or self._last_plan is None:
            return None
        shift = self._actions_taken
        if shift >= self.horizon:
            return None  # nothing of the old plan remains
        prev = self._last_plan[0]  # (H, D)
        if shift == 0:
            return prev[None]
        shifted = np.concatenate(
            [prev[shift:], np.repeat(prev[-1:], shift, axis=0)], axis=0
        )
        return shifted[None]

    def _fill_action_buffer(self, trajectory: np.ndarray) -> None:
        """Extract and buffer actions (reference policies.py:181-191).

        NOTE (parity quirk preserved): the reference buffers from t=0 — the
        row whose action was zeroed by conditioning — so the first action of
        every replan unnormalizes to the dataset-mean action.
        """
        traj = trajectory[0]
        a0, a1 = self.observation_dim, self.observation_dim + self.action_dim
        start = 1 if self.skip_conditioned_action else 0
        stop = min(self.action_horizon + 1, self.horizon)
        if self.track_planned_states:
            # closed-loop tracking: buffer the planned NEXT states; actions
            # are computed per step in get_action from the observed state
            stop = min(stop, self.horizon - 1)
            obs_rows = self.normalizer.unnormalize_observations(
                traj[start : stop + 1, : self.observation_dim]
            )
            for nxt in obs_rows[1:]:
                self.action_buffer.append(np.asarray(nxt))
        elif self.inverse_dynamics is not None:
            # a_t = g(s_t, s_{t+1}) from planned states (one batched call)
            stop = min(stop, self.horizon - 1)
            obs_rows = self.normalizer.unnormalize_observations(
                traj[start : stop + 1, : self.observation_dim]
            )
            acts = np.asarray(
                self.inverse_dynamics(obs_rows[:-1], obs_rows[1:])
            )
            for a in acts:
                self.action_buffer.append(np.ravel(a))
        else:
            for t in range(start, stop):
                normed = traj[t, a0:a1]
                action = self.normalizer.unnormalize_actions(normed.reshape(1, -1))
                self.action_buffer.append(np.ravel(action))
        # plan rows aligned with each buffered action, for deviation checks
        self._planned_obs = [
            traj[start + i, : self.observation_dim]
            for i in range(len(self.action_buffer))
        ]

    def _deviated_from_plan(self, observation) -> bool:
        """True when the executed observation drifted more than
        ``replan_deviation`` (normalized L2) from the plan row it should be
        on — the remaining open-loop actions are then stale."""
        if self.replan_deviation is None or not self._planned_obs:
            return False
        cur = self.normalizer.normalize_observations(
            self._process_observation(observation)
        )[0]
        return float(
            np.linalg.norm(cur - self._planned_obs[0])
        ) > self.replan_deviation

    def get_action(self, observation, **kwargs) -> np.ndarray:
        """Pop the buffer or replan (reference policies.py:193-223)."""
        if self.action_buffer and self._deviated_from_plan(observation):
            self.action_buffer.clear()
            self._planned_obs.clear()
        if not self.action_buffer:
            trajectory = self.plan(observation)
            self._fill_action_buffer(trajectory)
        self._actions_taken += 1
        if self._planned_obs:
            self._planned_obs.pop(0)
        item = self.action_buffer.pop(0)
        if self.track_planned_states:
            # u_t = g(s_observed, s_planned_next): recompute from the REAL
            # state so within-chunk drift is steered back toward the plan
            obs_phys = self._process_observation(observation)
            return np.ravel(
                np.asarray(self.inverse_dynamics(obs_phys, item[None]))
            )
        return item

    def reset(self) -> None:
        self.action_buffer.clear()
        self._last_plan = None
        self._actions_taken = 0
        self._planned_obs = []


class MPCPolicy(GuidedPolicy):
    """Plan once, execute ``action_horizon`` actions, replan
    (reference policies.py:226-240)."""

    def __init__(self, diffusion, normalizer, params=None, action_horizon: int = 8,
                 **kwargs):
        super().__init__(
            diffusion, normalizer, params=params, action_horizon=action_horizon,
            **kwargs,
        )


class ValueGuidedPolicy(GuidedPolicy):
    """Classifier guidance from a learned value function over observations
    (reference policies.py:243-271)."""

    def __init__(
        self,
        diffusion,
        normalizer,
        value_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        params=None,
        guide_weight: float = 1.0,
        action_horizon: Optional[int] = None,
        trajectory_value_fn: Optional[Callable] = None,
        **kwargs,
    ):
        """Two guide flavors:
        value_fn(obs (B,H,obs_dim)) -> (B,H) per-step values, summed over the
            horizon (reference policies.py:264-268 semantics);
        trajectory_value_fn(x (B,H,D), t (B,)) -> (B,) — the Diffuser-style
            noisy-trajectory value net (models/value_net.py)."""
        obs_dim = diffusion.observation_dim

        if trajectory_value_fn is not None:
            guide_fn = trajectory_value_fn
        elif value_fn is not None:
            def guide_fn(x, t):
                obs = x[:, :, :obs_dim]
                return jnp.sum(value_fn(obs), axis=1)
        else:
            raise ValueError("provide value_fn or trajectory_value_fn")

        super().__init__(
            diffusion, normalizer, params=params, guide_fn=guide_fn,
            guide_weight=guide_weight, action_horizon=action_horizon, **kwargs,
        )
        self.value_fn = value_fn


class DynamicsAwarePolicy(GuidedPolicy):
    """Trajectories projected onto the dynamics-consistent subspace at every
    denoise step — the paper's x_{i-1} = project(denoise(x_i))
    (reference policies.py:274-485; projection actually wired in here).
    """

    def __init__(
        self,
        diffusion,
        projection_matrix: Optional[np.ndarray] = None,
        normalizer=None,
        params=None,
        state_dim: int = 4,
        observation_dim: Optional[int] = None,
        action_dim: Optional[int] = None,
        horizon: Optional[int] = None,
        projection_schedule: str = "constant",
        projection_strength: float = 1.0,
        action_horizon: Optional[int] = None,
        sampling_timesteps: Optional[int] = None,
        parity_mode: bool = False,
        wall_grid=None,
        wall_margin: Optional[float] = None,
        seed: int = 0,
        guide_fn: Optional[Callable] = None,
        guide_weight: float = 0.0,
        **kwargs,
    ):
        horizon = horizon if horizon is not None else diffusion.horizon
        # default action_horizon = horizon for MPC behavior (reference :304-305)
        if action_horizon is None:
            action_horizon = horizon

        if normalizer is None:
            # GuidedPolicy.plan unconditionally normalizes observations, so
            # a missing normalizer would construct fine and crash on first
            # use (also under parity_mode).
            raise ValueError("DynamicsAwarePolicy requires a normalizer")
        for name, given, expected in (
            ("observation_dim", observation_dim, diffusion.observation_dim),
            ("action_dim", action_dim, diffusion.action_dim),
        ):
            if given is not None and given != expected:
                raise ValueError(
                    f"{name}={given} does not match the diffusion model's "
                    f"{expected}"
                )

        spec = None
        if projection_matrix is not None and normalizer is not None:
            if wall_grid is not None:  # hashable for the jit-closed spec
                wall_grid = tuple(tuple(int(v) for v in row) for row in wall_grid)
            spec = ProjectionSpec(
                state_dim=state_dim,
                schedule=projection_schedule,
                strength=projection_strength,
                parity_mode=parity_mode,
                wall_grid=wall_grid,
                wall_margin=wall_margin,
            )
        elif not parity_mode:
            # Without these the policy would silently sample like plain
            # guided while reporting itself dynamics-aware. Only
            # parity_mode=True (reproducing the reference's as-implemented
            # no-projection sampling) may omit them.
            raise ValueError(
                "DynamicsAwarePolicy requires a projection_matrix to apply "
                "projection; pass parity_mode=True for the reference's "
                "no-projection sampling"
            )

        # guidance composes with projection in the same scan body (the
        # sampler applies guide grads to the posterior mean, then projects),
        # so value guidance + dynamics-aware projection is a valid stack
        super().__init__(
            diffusion,
            normalizer,
            params=params,
            guide_fn=guide_fn,
            guide_weight=guide_weight,
            action_horizon=action_horizon,
            sampling_timesteps=sampling_timesteps,
            seed=seed,
            projection=spec,
            **kwargs,
        )

        self.state_dim = state_dim
        self.projection_schedule = projection_schedule
        self.projection_strength = projection_strength
        self.parity_mode = parity_mode
        self.projection_matrix = projection_matrix

        if projection_matrix is not None and normalizer is not None:
            self._P = jnp.asarray(projection_matrix, jnp.float32)
            self._stats = NormStats.from_normalizer(normalizer)
