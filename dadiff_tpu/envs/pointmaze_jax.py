"""Pure-JAX batched PointMaze: on-device env stepping.

This is the framework's MJX-equivalent (MJX is absent from this image): a
vectorized, jit/vmap-friendly point-mass maze whose semantics track
gymnasium-robotics PointMaze (maps, goal threshold 0.45, sparse/dense reward
exp(-d), action clip ±1, velocity clip ±5 — see
gymnasium_robotics/envs/maze/{maze_v4,point}.py) with double-integrator
physics (dt=0.1, the linearization the reference itself uses for PointMaze,
extractor.py:93-133) and disc-vs-wall-box collision resolution (push-out
along the minimal translation vector, tangential velocity preserved — the
closest cheap analogue of MuJoCo's sphere/box contact; ``collision="axis"``
restores the round-2-early axis-freeze model).

Everything is a pure function over a ``PointMazeState`` pytree, so thousands
of envs run as one XLA program, composing directly with the batched planner
(envs/rollout.py). The official reference-protocol comparison still uses the
host env (envs/host.py); this env is for on-device training-data generation
and large-scale planning benchmarks.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Canonical maps (gymnasium_robotics/envs/maze/maps.py layout: 1 = wall)
MAZE_MAPS = {
    "umaze": [
        [1, 1, 1, 1, 1],
        [1, 0, 0, 0, 1],
        [1, 1, 1, 0, 1],
        [1, 0, 0, 0, 1],
        [1, 1, 1, 1, 1],
    ],
    "open": [
        [1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 1, 1, 1, 1, 1, 1],
    ],
    "medium": [
        [1, 1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 1, 1, 0, 0, 1],
        [1, 0, 0, 1, 0, 0, 0, 1],
        [1, 1, 0, 0, 0, 1, 1, 1],
        [1, 0, 0, 1, 0, 0, 0, 1],
        [1, 0, 1, 0, 0, 1, 0, 1],
        [1, 0, 0, 0, 1, 0, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1],
    ],
    "large": [
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 1],
        [1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1],
        [1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1],
        [1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1],
        [1, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0, 1],
        [1, 1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 1],
        [1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    ],
}

GOAL_THRESHOLD = 0.45
VELOCITY_LIMIT = 5.0
AGENT_RADIUS = 0.1


def xy_to_cell(xy, H: int, W: int):
    """Physical xy -> (row, col) grid cell, gymnasium-robotics convention
    (origin at maze center, y up / row down). The single source of the
    coordinate mapping — used by the env and by the wall-aware projection
    (ops/projection.py)."""
    col = jnp.floor(xy[..., 0] + W / 2.0).astype(jnp.int32)
    row = jnp.floor(H / 2.0 - xy[..., 1]).astype(jnp.int32)
    col = jnp.clip(col, 0, W - 1)
    row = jnp.clip(row, 0, H - 1)
    return row, col


class PointMazeState(NamedTuple):
    """Batched env state pytree."""

    pos: jax.Array  # (B, 2)
    vel: jax.Array  # (B, 2)
    goal: jax.Array  # (B, 2)
    t: jax.Array  # (B,) int32 step counter
    done: jax.Array  # (B,) bool


@dataclasses.dataclass(frozen=True)
class PointMazeJax:
    """Batched point-mass maze (static config; methods pure).

    Physics defaults are sysID-calibrated to the real gymnasium-robotics
    PointMaze (least-squares fit on expert transitions, R^2 > 0.99):
        v' = damping * v + vel_gain * a      (then clipped to ±5)
        p' = p + pos_dt * v'
    Set damping=1, vel_gain=dt, pos_dt=dt for the textbook double integrator
    the reference linearizes with (extractor.py:93-133).
    """

    map_name: str = "umaze"
    pos_dt: float = 0.0099
    vel_gain: float = 0.222
    damping: float = 0.9885
    reward_type: str = "sparse"  # 'sparse' | 'dense'
    continuing_task: bool = True
    max_episode_steps: int = 1000
    reset_noise: float = 0.25
    collision: str = "disc"  # 'disc' (MuJoCo-like sphere/box) | 'axis'
    wall_slack: float = 0.02  # allowed penetration (MuJoCo soft contact)

    @property
    def maze(self) -> np.ndarray:
        return np.asarray(MAZE_MAPS[self.map_name], dtype=np.int32)

    @property
    def occupancy(self) -> jax.Array:
        return jnp.asarray(self.maze)

    def _cell_centers(self) -> np.ndarray:
        """xy centers of free cells (gymnasium-robotics coordinates: origin at
        maze center, y increasing upward/row decreasing)."""
        maze = self.maze
        H, W = maze.shape
        rows, cols = np.nonzero(maze == 0)
        x = (cols + 0.5) - W / 2.0
        y = H / 2.0 - (rows + 0.5)
        return np.stack([x, y], axis=-1).astype(np.float32)

    def _xy_to_cell(self, xy: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return xy_to_cell(xy, *self.maze.shape)

    def _is_wall(self, xy: jax.Array) -> jax.Array:
        """Wall check with agent radius: probe the 4 radius-offset corners."""
        occ = self.occupancy
        hit = jnp.zeros(xy.shape[:-1], bool)
        for dx in (-AGENT_RADIUS, AGENT_RADIUS):
            for dy in (-AGENT_RADIUS, AGENT_RADIUS):
                row, col = self._xy_to_cell(xy + jnp.asarray([dx, dy]))
                hit = hit | (occ[row, col] == 1)
        return hit

    def _resolve_disc(
        self, pos: jax.Array, vel: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Disc-vs-wall-box contact: push the agent out of any wall box it
        overlaps along the minimal translation vector and remove the inward
        normal velocity component (tangential preserved → wall sliding).

        ``wall_slack`` lets the disc overlap walls by a small depth before
        the push-out triggers, approximating MuJoCo's soft contact (measured
        host penetrations reach ~0.02 at full speed). Two passes handle
        corner/multi-wall contacts; 9 static neighbor-box checks per pass.
        """
        occ = self.occupancy
        Hm, Wm = self.maze.shape
        reach = AGENT_RADIUS - self.wall_slack
        for _ in range(2):
            row, col = self._xy_to_cell(pos)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    r_ = jnp.clip(row + dr, 0, Hm - 1)
                    c_ = jnp.clip(col + dc, 0, Wm - 1)
                    is_w = occ[r_, c_] == 1
                    lo = jnp.stack(
                        [c_ - Wm / 2.0, Hm / 2.0 - (r_ + 1)], axis=-1
                    ).astype(pos.dtype)
                    q = jnp.clip(pos, lo, lo + 1.0)  # closest box point
                    d = pos - q
                    dist = jnp.linalg.norm(d, axis=-1)
                    pen = reach - dist
                    hit = is_w & (pen > 0) & (dist > 1e-9)
                    n = d / jnp.maximum(dist, 1e-9)[..., None]
                    pos = jnp.where(hit[..., None], pos + n * pen[..., None], pos)
                    vn = jnp.sum(vel * n, axis=-1)
                    kill = hit & (vn < 0)
                    vel = jnp.where(
                        kill[..., None], vel - vn[..., None] * n, vel
                    )
        return pos, vel

    # -- API -------------------------------------------------------------------
    def reset(self, rng: jax.Array, batch_size: int = 1) -> Tuple[PointMazeState, jax.Array]:
        """Sample start/goal uniformly over free cells + position noise
        (gymnasium-robotics semantics).

        The goal cell is drawn distinct from the start cell: the real env's
        ``generate_reset_pos`` rejects reset positions within 0.5*scaling of
        the goal (gymnasium_robotics maze_v4). Distinct cells (centers >= 1
        apart) with +-0.25 noise keep start-goal distance >= 0.5 > the 0.45
        success threshold, so no episode begins trivially successful.
        """
        centers = jnp.asarray(self._cell_centers())
        n_cells = centers.shape[0]
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        start_idx = jax.random.randint(k1, (batch_size,), 0, n_cells)
        goal_idx = (
            start_idx + jax.random.randint(k2, (batch_size,), 1, n_cells)
        ) % n_cells
        pos = centers[start_idx] + jax.random.uniform(
            k3, (batch_size, 2), minval=-self.reset_noise, maxval=self.reset_noise
        )
        goal = centers[goal_idx] + jax.random.uniform(
            k4, (batch_size, 2), minval=-self.reset_noise, maxval=self.reset_noise
        )
        state = PointMazeState(
            pos=pos,
            vel=jnp.zeros((batch_size, 2)),
            goal=goal,
            t=jnp.zeros((batch_size,), jnp.int32),
            done=jnp.zeros((batch_size,), bool),
        )
        return state, self.observation(state)

    def observation(self, state: PointMazeState) -> jax.Array:
        """Goal-conditioned obs [x, y, vx, vy, gx, gy] — the same layout the
        data layer trains on (sources.flatten_observation)."""
        return jnp.concatenate([state.pos, state.vel, state.goal], axis=-1)

    def step(
        self, state: PointMazeState, action: jax.Array
    ) -> Tuple[PointMazeState, jax.Array, jax.Array, jax.Array]:
        """One physics step. Returns (state, obs, reward, done)."""
        a = jnp.clip(action, -1.0, 1.0)
        vel = jnp.clip(
            self.damping * state.vel + a * self.vel_gain,
            -VELOCITY_LIMIT,
            VELOCITY_LIMIT,
        )

        if self.collision == "disc":
            # MuJoCo-like sphere/box contact: integrate then resolve overlap.
            pos, vel = self._resolve_disc(state.pos + vel * self.pos_dt, vel)
        else:
            # axis-separated wall resolution: blocked axes stop (vel zeroed)
            pos_x_try = state.pos + jnp.stack(
                [vel[..., 0] * self.pos_dt, jnp.zeros_like(vel[..., 1])], axis=-1
            )
            hit_x = self._is_wall(pos_x_try)
            pos_x = jnp.where(hit_x[..., None], state.pos, pos_x_try)
            vel = vel.at[..., 0].set(jnp.where(hit_x, 0.0, vel[..., 0]))

            pos_y_try = pos_x + jnp.stack(
                [jnp.zeros_like(vel[..., 0]), vel[..., 1] * self.pos_dt], axis=-1
            )
            hit_y = self._is_wall(pos_y_try)
            pos = jnp.where(hit_y[..., None], pos_x, pos_y_try)
            vel = vel.at[..., 1].set(jnp.where(hit_y, 0.0, vel[..., 1]))

        dist = jnp.linalg.norm(pos - state.goal, axis=-1)
        success = dist <= GOAL_THRESHOLD
        if self.reward_type == "dense":
            reward = jnp.exp(-dist)
        else:
            reward = success.astype(jnp.float32)

        t = state.t + 1
        terminated = jnp.zeros_like(success) if self.continuing_task else success
        done = state.done | terminated | (t >= self.max_episode_steps)

        new_state = PointMazeState(pos=pos, vel=vel, goal=state.goal, t=t, done=done)
        return new_state, self.observation(new_state), reward, done
