#!/usr/bin/env python
"""Error-bounded surrogate protocol for on-device locomotion numbers.

VERDICT r2 "missing #1": true-physics on-device locomotion stepping is
impossible in this image (no MJX), so on-device locomotion evals run a
LEARNED simulator (envs/learned_model.py) whose returns drift from host
MuJoCo ground truth. This script turns that drift into a *measured,
quotable error bound*: it replays held-out recorded action sequences
through the ensemble surrogate from the same start states the real env
actually visited, and compares the surrogate's return against the
recorded ground-truth return segment-by-segment, as a function of the
open-loop chunk length K.

Because the held-out data WAS collected in the real env, the recorded
next-states/rewards are exact MuJoCo ground truth for those actions — no
state injection or re-stepping is needed, and the comparison is
bit-honest. Two evaluation distributions are measured:

  * the training-data distribution (held-out episodes of the fit mix) —
    the optimistic case;
  * the diffusion policy's OWN visited rollouts (``--visited``, the
    ``--save-episodes`` output) — the distribution on-device eval
    actually runs on.

Outputs, per chunk length K: p50/p90 absolute return error of the
surrogate, the reward-model floor (reward_model applied to REAL
transitions vs recorded reward — isolates reward-model error from
dynamics error), and a cross-fitted affine calibration residual. The
protocol: on-device locomotion returns are quotable for replan chunks
<= K* (the largest K whose p90 error <= --tolerance x the segment reward
scale) with +/- p90(K) error bars; beyond K*, host anchoring is required.

No reference counterpart (the reference steps host MuJoCo per action,
reference scripts/evaluate.py:240).
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


def segments_from_episodes(episodes, k, stride, skip_initial):
    """(obs0, acts, rews, real_next_obs) stacks of length-k windows.

    Windows are built PER chunk length k (ADVICE r3: windowing everything
    at max(k) silently excluded episodes shorter than max(k)+skip from the
    small-K rows). Returns (stacks, n_episodes_excluded).
    """
    obs0, acts, rews, nxts = [], [], [], []
    excluded = 0
    for ep in episodes:
        o, a, r = ep["observations"], ep["actions"], ep["rewards"]
        n = len(a)
        if n - k <= skip_initial:
            excluded += 1
            continue
        for t in range(skip_initial, n - k, stride):
            obs0.append(o[t])
            acts.append(a[t : t + k])
            rews.append(r[t : t + k])
            nxts.append(o[t + 1 : t + k + 1])
    if not obs0:
        return None, excluded
    return (
        (np.stack(obs0), np.stack(acts), np.stack(rews), np.stack(nxts)),
        excluded,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="HalfCheetah-v5")
    p.add_argument("--data", type=str, nargs="+", required=True,
                   help="dataset spec(s) for the simulator fit pool")
    p.add_argument("--visited", type=str, default=None,
                   help="npz of the diffusion policy's own rollouts "
                        "(evaluate --save-episodes output) — the "
                        "on-policy evaluation distribution")
    p.add_argument("--holdout-every", type=int, default=7,
                   help="every Nth pool episode is held out of the fit")
    p.add_argument("--k", type=int, nargs="+",
                   default=[4, 8, 16, 32, 64, 128])
    p.add_argument("--stride", type=int, default=60)
    p.add_argument("--skip-initial", type=int, default=5)
    p.add_argument("--sim-hidden", type=int, nargs="+", default=[512, 512])
    p.add_argument("--sim-steps", type=int, default=12000)
    p.add_argument("--sim-ensemble", type=int, default=4)
    p.add_argument("--tolerance", type=float, default=0.10,
                   help="quotability threshold: p90 |err| <= tol * "
                        "mean|R_real| defines K*")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    if args.holdout_every < 2:
        p.error("--holdout-every must be >= 2 (1 would hold out every "
                "episode, leaving nothing to fit the simulator on)")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dadiff_tpu.datasets.sources import load_episodes
    from dadiff_tpu.envs.learned_model import (
        reward_model_for,
        train_dynamics_ensemble,
    )

    pool = []
    for spec in args.data:
        pool.extend(load_episodes(spec))
    held = pool[:: args.holdout_every]
    fit = [ep for i, ep in enumerate(pool) if i % args.holdout_every]
    print(f"pool {len(pool)} episodes -> fit {len(fit)} / held {len(held)}",
          flush=True)

    t0 = time.time()
    model, stacked, stats, metrics = train_dynamics_ensemble(
        fit, n_models=args.sim_ensemble, hidden=tuple(args.sim_hidden),
        n_steps=args.sim_steps, seed=args.seed,
    )
    print(f"ensemble fit in {time.time() - t0:.0f}s: "
          f"held-out one-step R^2 mean={metrics['r2_mean']:.4f}", flush=True)

    reward_fn = reward_model_for(args.env)

    def mean_step(obs, act):
        """Deterministic ensemble-mean step (the bound's surrogate)."""
        o_n = (obs - stats.obs_mean) / stats.obs_std
        a_n = (act - stats.act_mean) / stats.act_std
        d_n = jnp.mean(
            jax.vmap(lambda pp: model.apply({"params": pp}, o_n, a_n))(
                stacked
            ),
            axis=0,
        )
        return obs + d_n * stats.delta_std + stats.delta_mean

    @jax.jit
    def rollout(obs0, acts):
        """obs0 (S,d), acts (S,K,da) -> sim next_obs (S,K,d), rew (S,K)."""

        def body(o, a):
            nxt = mean_step(o, a)
            r, _ = reward_fn(o, nxt, a)
            return nxt, (nxt, r)

        _, (nxts, rs) = lax.scan(body, obs0, jnp.swapaxes(acts, 0, 1))
        return jnp.swapaxes(nxts, 0, 1), jnp.swapaxes(rs, 0, 1)

    def measure(name, episodes):
        obs_scale = np.asarray(stats.obs_std)
        rows = []
        for K in args.k:
            seg, excluded = segments_from_episodes(
                episodes, K, args.stride, args.skip_initial
            )
            if seg is None:
                print(f"[{name}] K={K}: no segments (episodes too short)")
                continue
            obs0, acts, rews, real_nxt = seg
            if excluded:
                print(f"[{name}] K={K}: {excluded}/{len(episodes)} episodes "
                      f"too short for this window, excluded", flush=True)
            sim_nxt, sim_rew = map(
                np.asarray, rollout(jnp.asarray(obs0), jnp.asarray(acts))
            )
            # reward-model floor: reward_fn on REAL transitions vs recorded
            real_prev = np.concatenate(
                [obs0[:, None], real_nxt[:, :-1]], axis=1
            )
            floor_rew = np.asarray(
                reward_fn(jnp.asarray(real_prev), jnp.asarray(real_nxt),
                          jnp.asarray(acts))[0]
            )
            r_real = rews.sum(1)
            r_sim = sim_rew.sum(1)
            r_floor = floor_rew.sum(1)
            err = np.abs(r_sim - r_real)
            scale = float(np.mean(np.abs(r_real)))
            # cross-fitted affine calibration (fit even segs, score odd);
            # needs enough segments in both folds to be meaningful
            if len(r_real) >= 8:
                a_c, b_c = np.polyfit(r_sim[0::2], r_real[0::2], 1)
                resid = np.abs(a_c * r_sim[1::2] + b_c - r_real[1::2])
                calib_p90 = float(np.percentile(resid, 90))
            else:
                calib_p90 = None
            rmse = float(
                np.sqrt(
                    np.mean(
                        ((sim_nxt[:, -1] - real_nxt[:, -1]) / obs_scale) ** 2
                    )
                )
            )
            rows.append({
                "K": K,
                "n_segments": int(len(r_real)),
                "n_episodes_excluded": int(excluded),
                "mean_abs_R_real": scale,
                "err_p50": float(np.percentile(err, 50)),
                "err_p90": float(np.percentile(err, 90)),
                "floor_p90": float(
                    np.percentile(np.abs(r_floor - r_real), 90)
                ),
                "calib_resid_p90": calib_p90,
                "state_nrmse_at_K": rmse,
                "quotable": bool(
                    np.percentile(err, 90) <= args.tolerance * max(scale, 1e-9)
                ),
            })
        if not rows:
            print(f"[{name}] no usable segments at any K")
            return None
        k_star = max((r["K"] for r in rows if r["quotable"]), default=0)
        print(f"\n[{name}] segments per K "
              f"{ {r['K']: r['n_segments'] for r in rows} }; "
              f"K* (p90 err <= {args.tolerance:.0%} of |R|) = {k_star}")
        print("| K | |R_real| | sim err p50 | p90 | reward-model floor p90 "
              "| calib resid p90 | state nRMSE |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            calib = (f"{r['calib_resid_p90']:.2f}"
                     if r["calib_resid_p90"] is not None else "n/a")
            print(f"| {r['K']} | {r['mean_abs_R_real']:.2f} "
                  f"| {r['err_p50']:.2f} | {r['err_p90']:.2f} "
                  f"| {r['floor_p90']:.2f} | {calib} "
                  f"| {r['state_nrmse_at_K']:.2f} |")
        return {"rows": rows, "k_star": k_star}

    report = {
        "env": args.env,
        "fit_episodes": len(fit),
        "sim_r2": float(metrics["r2_mean"]),
        "tolerance": args.tolerance,
        "distributions": {},
    }
    out = measure("held-out fit mix", held)
    if out:
        report["distributions"]["heldout"] = out
    if args.visited:
        # accept either a bare npz path or a full dataset spec
        # (consistent with --data; ADVICE r3: 'npz:npz:...' double-prefix)
        known = ("npz:", "synthetic:", "expert:", "mppi:", "gym:", "minari:")
        spec = (args.visited
                if args.visited.startswith(known) or "+" in args.visited
                else f"npz:{args.visited}")
        out = measure("policy-visited", load_episodes(spec))
        if out:
            report["distributions"]["visited"] = out

    path = args.out or (
        f"results/surrogate_bound_{args.env.replace('-', '_')}.json"
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nsaved -> {path}")


if __name__ == "__main__":
    main()
