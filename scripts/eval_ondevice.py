#!/usr/bin/env python
"""Fully on-device batched evaluation (the BASELINE.json north-star loop).

Plans, actions, and environment physics all execute inside one jitted
program over a batch of pure-JAX PointMaze environments — zero host syncs
per episode. Reports success rate, mean reward, and episodes/hour.

    python scripts/eval_ondevice.py --checkpoint logs/.../checkpoint_step_N.pt \
        --dataset npz:data/pointmaze_umaze_expert.npz --batch 256 \
        --n-replans 16 --action-horizon 16 [--projection]
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass
import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="On-device batched evaluation")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True,
                   help="dataset spec for the normalizer")
    p.add_argument("--map", type=str, default="umaze",
                   choices=["umaze", "open", "medium", "large"])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--n-replans", type=int, default=16)
    p.add_argument("--action-horizon", type=int, default=16)
    p.add_argument("--sampling-timesteps", type=int, default=None)
    p.add_argument("--sampler", type=str, default="ddpm",
                   choices=["ddpm", "ddim", "dpmpp", "consistency"],
                   help="consistency = few-step distilled student checkpoint "
                        "(--sampling-timesteps is the model-call budget)")
    p.add_argument("--projection", action="store_true",
                   help="dynamics-aware per-step projection in the plan scan")
    p.add_argument("--n-candidates", type=int, default=1,
                   help="best-of-N candidate plans per replan wave (fused)")
    p.add_argument("--warm-start-t", type=int, default=None,
                   help="warm-start replans after the first from the shifted "
                        "previous plan re-noised to this timestep")
    p.add_argument("--projection-schedule", type=str, default="noise_schedule")
    p.add_argument("--wall-aware", action="store_true",
                   help="obstacle-aware projection: revert plan rows dragged "
                        "into wall cells of the selected map")
    p.add_argument("--collision", type=str, default="disc",
                   choices=["disc", "axis"],
                   help="wall contact model: MuJoCo-like disc push-out "
                        "(default) or the harsher axis-freeze")
    p.add_argument("--wall-slack", type=float, default=0.02,
                   help="soft-contact penetration allowance of the disc "
                        "model (calibrate per map with "
                        "scripts/calibrate_contact.py)")
    p.add_argument("--megakernel", action="store_true",
                   help="run every replan wave (all candidates, "
                        "conditioning, per-step projection, best-of-N "
                        "selection) through the single-pallas_call batched "
                        "planning kernel (ops/pallas_planner.py) instead of "
                        "the XLA scan sampler")
    p.add_argument("--mega-group-chains", type=int, default=64,
                   help="chains row-stacked per megakernel grid group "
                        "(VMEM activation budget knob)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--device", type=str, default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--results-dir", type=str, default="./results",
                   help="directory for the timestamped results JSON "
                        "(same schema as scripts/evaluate.py; '' disables)")
    args = p.parse_args(argv)

    from dadiff_tpu.cli import _select_device, load_model

    _select_device(args.device)

    import jax
    import jax.numpy as jnp

    from dadiff_tpu.envs.pointmaze_jax import PointMazeJax
    from dadiff_tpu.envs.rollout import make_ondevice_evaluator
    from dadiff_tpu.guides.sampling import ProjectionSpec
    from dadiff_tpu.ops.projection import NormStats

    diffusion, params, dataset = load_model(args.checkpoint, args.dataset)
    is_cm = bool(getattr(dataset, "checkpoint_config", {}).get("consistency"))
    if is_cm and args.sampler != "consistency":
        raise SystemExit("checkpoint is a consistency-distilled student; "
                         "pass --sampler consistency")
    env = PointMazeJax(map_name=args.map, collision=args.collision,
                       wall_slack=args.wall_slack)
    stats = NormStats.from_normalizer(dataset.normalizer)

    projection = None
    P = None
    if args.projection:
        from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
        from dadiff_tpu.dynamics.registry import get_dynamics_for_env
        from dadiff_tpu.datasets.sources import load_episodes

        episodes = (
            load_episodes(args.dataset)
            if args.dataset.startswith(("synthetic:", "npz:", "gym:", "expert:"))
            else None
        )
        A, B, state_dim, action_dim = get_dynamics_for_env(
            "PointMaze_UMaze-v3", dataset_name=None if episodes else args.dataset,
            episodes=episodes,
        )
        P = jnp.asarray(
            ProjectionMatrixBuilder(A, B, state_dim, action_dim)
            .get_projection_matrix(diffusion.horizon)
        )
        wall_grid = None
        if args.wall_aware:
            wall_grid = tuple(tuple(int(v) for v in row) for row in env.maze)
        projection = ProjectionSpec(
            state_dim=state_dim, schedule=args.projection_schedule,
            wall_grid=wall_grid,
        )

    evaluator = make_ondevice_evaluator(
        diffusion, env,
        action_horizon=args.action_horizon,
        n_replans=args.n_replans,
        sampling_timesteps=args.sampling_timesteps,
        projection=projection,
        n_candidates=args.n_candidates,
        warm_start_t=args.warm_start_t,
        sampler=args.sampler,
        use_megakernel=args.megakernel,
        P=P,
        stats=stats,
        mega_group_chains=args.mega_group_chains,
    )

    # compile
    t0 = time.time()
    metrics, _ = evaluator(params, jax.random.PRNGKey(args.seed), stats,
                           args.batch, P)
    jax.block_until_ready(metrics)
    compile_s = time.time() - t0

    # timed run
    t0 = time.time()
    metrics, _ = evaluator(params, jax.random.PRNGKey(args.seed + 1), stats,
                           args.batch, P)
    jax.block_until_ready(metrics)
    run_s = time.time() - t0

    episodes_per_hour = args.batch / run_s * 3600
    out = {
        "mode": "on-device plan->step->replan",
        "megakernel": bool(args.megakernel),
        "projection": bool(args.projection),
        "wall_aware": bool(args.wall_aware),
        "n_candidates": args.n_candidates,
        "warm_start_t": args.warm_start_t,
        "batch": args.batch,
        "env_steps_per_episode": args.n_replans * args.action_horizon,
        "success_rate": float(metrics.success_rate),
        "mean_reward": float(metrics.mean_reward),
        "mean_final_distance": float(metrics.mean_final_distance),
        "wallclock_s": round(run_s, 2),
        "episodes_per_hour": round(episodes_per_hour, 0),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(out, indent=2))
    if args.results_dir:
        # persist the same results/ schema the host protocol uses
        # (VERDICT r4 weak #3: headline numbers must leave artifacts)
        import numpy as np

        from dadiff_tpu.envs.host import save_results

        per_reward = np.asarray(metrics.per_env_reward, dtype=np.float64)
        per_succ = np.asarray(metrics.per_env_success)
        n_steps = args.n_replans * args.action_horizon
        path = save_results(
            {
                "mean_reward": float(per_reward.mean()),
                "std_reward": float(per_reward.std()),
                "mean_length": float(n_steps),
                "std_length": 0.0,
                "success_rate": float(per_succ.mean()),
                "episode_rewards": [float(r) for r in per_reward],
                "episode_lengths": [n_steps] * args.batch,
            },
            policy_type="ondevice-maze",
            env_name=f"PointMaze_{args.map}",
            results_dir=args.results_dir,
            checkpoint=args.checkpoint,
            dataset=args.dataset,
            n_episodes=args.batch,
            sampling_timesteps=args.sampling_timesteps,
            seed=args.seed,
            extra=out | {
                "action_horizon": args.action_horizon,
                "n_replans": args.n_replans,
                "sampler": args.sampler,
                "collision": args.collision,
                "wall_slack": args.wall_slack,
                "per_env_success": [bool(s) for s in per_succ],
            },
        )
        print(f"results saved to {path}")
    return out


if __name__ == "__main__":
    main()
