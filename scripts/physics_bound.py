#!/usr/bin/env python
"""K-step return-error bound for the TRUE-PHYSICS on-device HalfCheetah.

Same protocol as scripts/surrogate_bound.py (the yardstick the learned
surrogate was judged by, docs/surrogate_protocol.md): replay recorded
action windows from recorded real-env start states through the backend
and compare K-step returns against the recorded MuJoCo ground truth.
Here the backend is dadiff_tpu.envs.locomotion_jax (planar_physics) —
acceptance bar from VERDICT r3 #3: beat the learned surrogate's measured
bound (K* = 0 at the 10% band; p90 17.4 at K=16) with K* >= 16.

Because the physics is the same up to solver/precision noise, residual
error measures float-precision chaos amplification, not model error —
measured separately for float32 (the TPU serving dtype) and float64.
"""

try:
    import _path  # noqa: F401
except ImportError:
    pass
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="HalfCheetah-v5",
                   help="HalfCheetah-v5 / Hopper-v5 / Walker2d-v5")
    p.add_argument("--data", type=str, nargs="+", required=True)
    p.add_argument("--visited", type=str, default=None)
    p.add_argument("--holdout-every", type=int, default=7,
                   help="use every Nth episode (match surrogate_bound's "
                        "held-out subset for comparability)")
    p.add_argument("--k", type=int, nargs="+", default=[4, 8, 16, 32, 64, 128])
    p.add_argument("--stride", type=int, default=60)
    p.add_argument("--skip-initial", type=int, default=5)
    p.add_argument("--solver-iters", type=int, default=100)
    p.add_argument("--tolerance", type=float, default=0.10)
    p.add_argument("--x64", action="store_true",
                   help="run the physics in float64 (default: float32, "
                        "the TPU serving dtype)")
    p.add_argument("--device", type=str, default="cpu",
                   choices=["cpu", "tpu"])
    p.add_argument("--max-segments", type=int, default=512)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from dadiff_tpu.datasets.sources import load_episodes
    from dadiff_tpu.envs.locomotion_jax import physics_env_for

    from surrogate_bound import segments_from_episodes

    env = physics_env_for(args.env, solver_iters=args.solver_iters)
    dtype = jnp.float64 if args.x64 else jnp.float32

    @jax.jit
    def rollout(obs0, acts):
        qpos, qvel = env.obs_to_state(obs0.astype(dtype))
        _, rew = env.rollout(qpos, qvel, acts.astype(dtype))
        return rew

    def measure(name, episodes):
        rows = []
        for K in args.k:
            seg, excluded = segments_from_episodes(
                episodes, K, args.stride, args.skip_initial
            )
            if seg is None:
                print(f"[{name}] K={K}: no segments")
                continue
            obs0, acts, rews, _ = seg
            if len(obs0) > args.max_segments:
                idx = np.random.RandomState(0).choice(
                    len(obs0), args.max_segments, replace=False
                )
                obs0, acts, rews = obs0[idx], acts[idx], rews[idx]
            t0 = time.time()
            sim_rew = np.asarray(rollout(jnp.asarray(obs0), jnp.asarray(acts)))
            dt = time.time() - t0
            r_real = rews.sum(1)
            r_sim = sim_rew.sum(1)
            err = np.abs(r_sim - r_real)
            scale = float(np.mean(np.abs(r_real)))
            rows.append({
                "K": K,
                "n_segments": int(len(r_real)),
                "n_episodes_excluded": int(excluded),
                "mean_abs_R_real": scale,
                "err_p50": float(np.percentile(err, 50)),
                "err_p90": float(np.percentile(err, 90)),
                "quotable": bool(
                    np.percentile(err, 90)
                    <= args.tolerance * max(scale, 1e-9)
                ),
                "wall_s": round(dt, 2),
            })
            print(f"[{name}] K={K}: n={rows[-1]['n_segments']} "
                  f"|R|={scale:.2f} err p50={rows[-1]['err_p50']:.3f} "
                  f"p90={rows[-1]['err_p90']:.3f} "
                  f"quotable={rows[-1]['quotable']}", flush=True)
        if not rows:
            return None
        k_star = max((r["K"] for r in rows if r["quotable"]), default=0)
        print(f"[{name}] K* (p90 err <= {args.tolerance:.0%} of |R|) "
              f"= {k_star}")
        return {"rows": rows, "k_star": k_star}

    pool = []
    for spec in args.data:
        pool.extend(load_episodes(spec))
    held = pool[:: args.holdout_every]
    print(f"pool {len(pool)} episodes -> evaluating on {len(held)} "
          f"(every {args.holdout_every}th, matching surrogate_bound)",
          flush=True)

    report = {
        "env": args.env,
        "backend": "planar_physics",
        "dtype": "float64" if args.x64 else "float32",
        "solver_iters": args.solver_iters,
        "tolerance": args.tolerance,
        "distributions": {},
    }
    out = measure("held-out fit mix", held)
    if out:
        report["distributions"]["heldout"] = out
    if args.visited:
        known = ("npz:", "synthetic:", "expert:", "mppi:", "gym:", "minari:")
        spec = (args.visited
                if args.visited.startswith(known) or "+" in args.visited
                else f"npz:{args.visited}")
        out = measure("policy-visited", load_episodes(spec))
        if out:
            report["distributions"]["visited"] = out

    path = args.out or (
        f"results/physics_bound_{args.env.replace('-', '_')}"
        f"_{report['dtype']}.json"
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"saved -> {path}")


if __name__ == "__main__":
    main()
