"""Waypoint expert tests (data-collection subsystem)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dadiff_tpu.envs.expert import WaypointController
from dadiff_tpu.envs.pointmaze_jax import MAZE_MAPS, PointMazeJax


def test_bfs_path_umaze():
    c = WaypointController(MAZE_MAPS["umaze"])
    # from bottom-left free cell (3,1) to top-left free cell (1,1): must go
    # around through col 3 (the U): path length 7 cells
    path = c._bfs_path((3, 1), (1, 1))
    assert path[0] == (3, 1) and path[-1] == (1, 1)
    assert len(path) == 7
    # every step adjacent + free
    maze = np.asarray(MAZE_MAPS["umaze"])
    for (r1, c1), (r2, c2) in zip(path, path[1:]):
        assert abs(r1 - r2) + abs(c1 - c2) == 1
        assert maze[r2, c2] == 0


def test_bfs_unreachable_falls_back():
    grid = [[1, 1, 1, 1], [1, 0, 1, 0], [1, 1, 1, 1]]
    c = WaypointController(grid)
    path = c._bfs_path((1, 1), (1, 3))
    assert path == [(1, 3)]


def test_cell_xy_roundtrip():
    c = WaypointController(MAZE_MAPS["umaze"])
    for cell in [(1, 1), (2, 3), (3, 2)]:
        xy = c._cell_to_xy(cell)
        assert c._xy_to_cell(xy) == cell


def test_expert_solves_jax_umaze():
    """The waypoint expert drives the pure-JAX maze to the goal."""
    env = PointMazeJax(map_name="umaze")
    state, obs = env.reset(jax.random.PRNGKey(3), batch_size=1)
    controller = WaypointController(MAZE_MAPS["umaze"])
    reached = False
    for _ in range(400):
        a = controller.get_action(np.asarray(obs[0]))
        state, obs, reward, done = env.step(state, jnp.asarray(a)[None])
        if float(jnp.linalg.norm(state.pos - state.goal)) <= 0.45:
            reached = True
            break
    assert reached, (
        f"expert failed: pos={np.asarray(state.pos)}, goal={np.asarray(state.goal)}"
    )


def test_expert_spec_in_dispatcher():
    from dadiff_tpu.datasets.sources import load_episodes

    eps = load_episodes("expert:PointMaze_UMaze-v3:n=2,T=100")
    assert len(eps) == 2
    assert eps[0]["observations"].shape[-1] == 6
    assert eps[0]["actions"].shape[-1] == 2


def test_corner_safe_offsets_turn_waypoints():
    """corner_safe shifts 90-degree-turn waypoints away from the inner wall
    corner (the point the straight cut between adjacent cell centers grazes)
    and keeps the turn-flag list aligned with the path."""
    c_plain = WaypointController(MAZE_MAPS["medium"])
    c_safe = WaypointController(MAZE_MAPS["medium"], corner_safe=True)
    pos = np.array([-2.5, -1.5])
    goal = np.array([1.5, 1.5])
    c_plain._plan(pos, goal)
    c_safe._plan(pos, goal)
    assert len(c_safe._path) == len(c_plain._path) == len(c_safe._turn)
    assert any(c_safe._turn), "route should contain at least one turn"
    moved = [
        float(np.linalg.norm(a - b))
        for a, b, t in zip(c_safe._path, c_plain._path, c_safe._turn)
        if t
    ]
    assert moved and all(abs(d - 0.2) < 1e-9 for d in moved)
    # straight waypoints are untouched
    same = [
        float(np.linalg.norm(a - b))
        for a, b, t in zip(c_safe._path, c_plain._path, c_safe._turn)
        if not t
    ]
    assert all(d < 1e-9 for d in same)
    # offset direction points away from the inner corner: clearance of the
    # prev->wp->next polyline midpoint from the corner cell grows
    for i, t in enumerate(c_safe._turn[:-1]):
        if not t or i == 0:
            continue
        prev_p, wp_p = c_plain._path[i - 1], c_plain._path[i]
        next_p = c_plain._path[i + 1]
        corner = (prev_p + next_p) / 2.0  # inner corner location
        assert np.linalg.norm(c_safe._path[i] - corner) > np.linalg.norm(
            wp_p - corner
        )


def test_corner_safe_expert_still_solves():
    env = PointMazeJax(map_name="medium")
    state, obs = env.reset(jax.random.PRNGKey(5), batch_size=1)
    controller = WaypointController(MAZE_MAPS["medium"], corner_safe=True)
    reached = False
    for _ in range(600):
        a = controller.get_action(np.asarray(obs[0]))
        state, obs, reward, done = env.step(state, jnp.asarray(a)[None])
        if float(jnp.linalg.norm(state.pos - state.goal)) <= 0.45:
            reached = True
            break
    assert reached


def test_lookahead_skips_straights_never_turns():
    """lookahead targets the next turn (or goal) directly on straight runs
    and never skips a turn waypoint."""
    c = WaypointController(MAZE_MAPS["large"], lookahead=True)
    pos = np.array([-4.5, -3.5])
    goal = np.array([4.5, 3.5])
    c._plan(pos, goal)
    turn_xys = [p.copy() for p, t in zip(c._path, c._turn) if t]
    # drive the skip logic from the start position
    obs = np.concatenate([pos, np.zeros(2), goal])
    c.get_action(obs)
    # first target after skipping must be a turn waypoint (or the goal)
    assert c._turn[0] or len(c._path) == 1
    # all turn waypoints are still present, in order
    remaining_turns = [p for p, t in zip(c._path, c._turn) if t]
    assert len(remaining_turns) == len(turn_xys)


def test_lookahead_expert_still_solves():
    env = PointMazeJax(map_name="medium")
    state, obs = env.reset(jax.random.PRNGKey(7), batch_size=1)
    controller = WaypointController(MAZE_MAPS["medium"], lookahead=True)
    reached = False
    for _ in range(600):
        a = controller.get_action(np.asarray(obs[0]))
        state, obs, reward, done = env.step(state, jnp.asarray(a)[None])
        if float(jnp.linalg.norm(state.pos - state.goal)) <= 0.45:
            reached = True
            break
    assert reached
