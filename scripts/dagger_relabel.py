#!/usr/bin/env python
"""DAgger-style relabeling of a diffusion policy's visited states.

Pipeline (targets the closed-loop distribution gap RESULTS.md diagnoses as
the locomotion ceiling):
  1. ``dadiff-eval ... --batched --save-episodes visited.npz`` records the
     states the diffusion-MPC policy actually visits.
  2. This script subsamples start states from those rollouts, refits the
     ensemble simulator on everything gathered so far (visited included),
     injects each start into a real MuJoCo env, and rolls the TPU-MPPI
     expert for a short segment — producing expert supervision exactly on
     the learner's visited distribution.
  3. Merge via a `+`-mixed dataset spec and retrain; iterate.

Example:
    python scripts/dagger_relabel.py --env HalfCheetah-v5 \
        --visited data/hc_visited_i1.npz \
        --pool npz:data/halfcheetah_mppi.npz npz:data/halfcheetah_engine_r2d.npz \
        --out data/hc_dagger_i1.npz
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="HalfCheetah-v5")
    p.add_argument("--visited", type=str, required=True,
                   help="npz of the policy's own rollouts "
                        "(evaluate --save-episodes output)")
    p.add_argument("--pool", type=str, nargs="+", required=True,
                   help="dataset spec(s) for the simulator fit pool "
                        "(the training mix; visited rollouts are added "
                        "automatically)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--segment-len", type=int, default=48,
                   help="expert segment length in real env steps (>= the "
                        "diffusion horizon so every segment yields full "
                        "training windows)")
    p.add_argument("--stride", type=int, default=25,
                   help="visited-state subsampling stride within an episode")
    p.add_argument("--skip-initial", type=int, default=10,
                   help="skip the first N steps of each visited episode "
                        "(reset-adjacent states are already covered)")
    p.add_argument("--max-segments", type=int, default=400)
    p.add_argument("--batch-envs", type=int, default=16)
    p.add_argument("--horizon", type=int, default=12,
                   help="MPPI planning horizon (control steps)")
    p.add_argument("--n-samples", type=int, default=1024)
    p.add_argument("--lam", type=float, default=0.3)
    p.add_argument("--sigma", type=float, default=0.4)
    p.add_argument("--n-exec", type=int, default=4)
    p.add_argument("--sim-hidden", type=int, nargs="+", default=[512, 512])
    p.add_argument("--sim-steps", type=int, default=12000)
    p.add_argument("--sim-ensemble", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from dadiff_tpu.cli import enable_compilation_cache
    enable_compilation_cache()

    from dadiff_tpu.datasets.sources import load_episodes, save_episodes_npz
    from dadiff_tpu.envs.mppi_tpu import dagger_relabel_episodes

    visited = load_episodes(f"npz:{args.visited}")
    pool = []
    for spec in args.pool:
        pool.extend(load_episodes(spec))
    print(f"visited: {len(visited)} episodes; sim pool: {len(pool)} episodes",
          flush=True)

    t0 = time.time()
    segments = dagger_relabel_episodes(
        args.env,
        visited,
        pool,
        segment_len=args.segment_len,
        stride=args.stride,
        skip_initial=args.skip_initial,
        max_segments=args.max_segments,
        batch_envs=args.batch_envs,
        horizon=args.horizon,
        n_samples=args.n_samples,
        lam=args.lam,
        sigma=args.sigma,
        n_exec=args.n_exec,
        sim_hidden=tuple(args.sim_hidden),
        sim_steps=args.sim_steps,
        sim_ensemble=args.sim_ensemble,
        seed=args.seed,
    )
    dt = time.time() - t0

    import numpy as np
    rets = [float(s["rewards"].sum()) for s in segments]
    steps = sum(len(s["rewards"]) for s in segments)
    print(f"relabeled {len(segments)} segments ({steps} real env steps) in "
          f"{dt / 60:.1f} min: segment return mean={np.mean(rets):.1f} "
          f"max={np.max(rets):.1f} min={np.min(rets):.1f}", flush=True)
    save_episodes_npz(args.out, segments)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
