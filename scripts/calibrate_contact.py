#!/usr/bin/env python
"""Calibrate the pure-JAX PointMaze wall contact against host MuJoCo.

Round 2 tuned ``wall_slack`` (soft-contact penetration allowance) once, on
UMaze; the Medium on-device evaluator still under-predicts the host
protocol (VERDICT r2 weak #5). This script measures one-step prediction
error of PointMazeJax against REAL env transitions collected near walls on
a chosen map, across a slack grid, and reports the best setting.

    python scripts/calibrate_contact.py --map medium --n-transitions 3000
"""

try:
    import _path  # noqa: F401
except ImportError:
    pass
import argparse
import json
import sys

sys.path.insert(0, ".")

ENV_NAMES = {
    "umaze": "PointMaze_UMaze-v3",
    "medium": "PointMaze_Medium-v3",
    "large": "PointMaze_Large-v3",
}


def collect_host_transitions(env_name, n, seed=0, toward_walls=True):
    """(pos, vel, act, pos', vel') tuples from the real env under a
    wall-seeking random policy (constant random headings held for several
    steps drive the agent into walls far more often than white noise)."""
    import gymnasium as gym
    import gymnasium_robotics  # noqa: F401  (registers PointMaze envs)
    import numpy as np

    env = gym.make(env_name)
    rng = np.random.RandomState(seed)
    out = []
    obs, _ = env.reset(seed=seed)
    heading = rng.uniform(-1, 1, 2)
    k = 0
    while len(out) < n:
        if k % 12 == 0:
            heading = rng.uniform(-1, 1, 2)
            heading /= max(1e-6, np.abs(heading).max())
        k += 1
        s = np.asarray(obs["observation"], np.float32)
        a = np.clip(heading + rng.randn(2) * 0.2, -1, 1).astype(np.float32)
        obs, _, term, trunc, _ = env.step(a)
        s2 = np.asarray(obs["observation"], np.float32)
        out.append((s, a, s2))
        if term or trunc:
            obs, _ = env.reset(seed=seed + k)
    env.close()
    import numpy as np

    s, a, s2 = map(np.stack, zip(*out))
    return s, a, s2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--map", type=str, default="medium",
                   choices=list(ENV_NAMES))
    p.add_argument("--n-transitions", type=int, default=3000)
    p.add_argument("--slacks", type=float, nargs="+",
                   default=[0.0, 0.01, 0.02, 0.03, 0.04, 0.06])
    p.add_argument("--near-wall-dist", type=float, default=0.35,
                   help="distance from the agent DISC EDGE to the nearest "
                        "wall box below which a transition counts as "
                        "near-wall")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", type=str, default="cpu",
                   choices=["cpu", "tpu"])
    args = p.parse_args()

    from dadiff_tpu.cli import _select_device

    _select_device(args.device)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dadiff_tpu.envs.pointmaze_jax import (
        AGENT_RADIUS,
        PointMazeJax,
        PointMazeState,
    )

    env_name = ENV_NAMES[args.map]
    print(f"collecting {args.n_transitions} host transitions on {env_name}...",
          flush=True)
    s, a, s2 = collect_host_transitions(
        env_name, args.n_transitions, seed=args.seed
    )

    base = PointMazeJax(map_name=args.map)
    maze = base.maze
    Hm, Wm = maze.shape

    # distance from disc edge to nearest wall box, vectorized on host
    def wall_dist(pos):
        rows, cols = np.nonzero(maze == 1)
        lo = np.stack([cols - Wm / 2.0, Hm / 2.0 - (rows + 1)], axis=-1)
        q = np.clip(pos[:, None, :], lo[None], lo[None] + 1.0)
        d = np.linalg.norm(pos[:, None, :] - q, axis=-1).min(axis=1)
        return d - AGENT_RADIUS

    near = wall_dist(s[:, :2]) < args.near_wall_dist
    print(f"near-wall transitions: {int(near.sum())}/{len(s)}")

    results = {}
    goal = jnp.zeros((len(s), 2))
    for slack in args.slacks:
        env_j = PointMazeJax(map_name=args.map, collision="disc",
                             wall_slack=float(slack))
        state = PointMazeState(
            pos=jnp.asarray(s[:, :2]), vel=jnp.asarray(s[:, 2:]),
            goal=goal, t=jnp.zeros(len(s), jnp.int32),
            done=jnp.zeros(len(s), bool),
        )
        nxt, *_ = jax.jit(env_j.step)(state, jnp.asarray(a))
        pred = np.concatenate(
            [np.asarray(nxt.pos), np.asarray(nxt.vel)], axis=-1
        )
        err_v = np.linalg.norm(pred[:, 2:] - s2[:, 2:], axis=-1)
        err_p = np.linalg.norm(pred[:, :2] - s2[:, :2], axis=-1)
        row = {
            "vel_err_mean_near": float(err_v[near].mean()),
            "vel_err_p95_near": float(np.percentile(err_v[near], 95)),
            "pos_err_p95_near": float(np.percentile(err_p[near], 95)),
            "vel_err_mean_free": float(err_v[~near].mean()),
        }
        results[slack] = row
        print(f"slack={slack:.3f}: " + json.dumps(row), flush=True)

    best = min(results, key=lambda k: results[k]["vel_err_p95_near"])
    print(f"\nbest slack on {args.map} by near-wall vel p95: {best} "
          f"(current default 0.02)")
    return results


if __name__ == "__main__":
    main()
