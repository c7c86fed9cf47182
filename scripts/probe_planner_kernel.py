#!/usr/bin/env python
"""Scaling probe for the batched planning megakernel (ops/pallas_planner.py).

Measures SUSTAINED per-chain cost at n_chains in {1,2,4,...} with and
without fused projection, estimates MFU from the analytic FLOP count of
the layer plan, and prints a JSON summary — the measurement base for
docs/megakernel_roofline.md (VERDICT r2 weak #2/#5: the batch-1 kernel sat
at ~11% MFU with H=32-row MXU underutilization named as the suspect; this
probe quantifies exactly how much row-stacking candidates recovers).

    python scripts/probe_planner_kernel.py [--chains 1 2 4 8 16 32 64]
"""

try:
    import _path  # noqa: F401
except ImportError:
    pass
import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def median_time(fn, n=7):
    times = []
    for i in range(n):
        t0 = time.time()
        fn(i).block_until_ready()
        times.append(time.time() - t0)
    return statistics.median(times)


def unet_flops_per_step(unet, horizon, n_chains):
    """Analytic MXU FLOPs of one denoise step (matmul terms only)."""
    from dadiff_tpu.ops.pallas_unet import _layer_plan

    ops, _ = _layer_plan(unet)
    rows = n_chains * horizon
    flops = 0
    k = 5
    for op in ops:
        kind = op[0]
        if kind == "res":
            _, _, cin, cout = op
            flops += 2 * rows * (k * cin) * cout      # block1
            flops += 2 * rows * (k * cout) * cout     # block2
            if cin != cout:
                flops += 2 * rows * cin * cout        # residual 1x1
        elif kind == "down":
            cin = op[2]
            flops += 2 * rows * (3 * cin) * cin
            rows //= 2
        elif kind == "up":
            cin = op[2]
            flops += 2 * rows * cin * cin * 4         # 4 taps
            rows *= 2
        elif kind == "res_plain":
            _, _, cin, cout = op
            flops += 2 * rows * (k * cin) * cout
        elif kind == "final_conv":
            _, _, cin, cout = op
            flops += 2 * rows * cin * cout
    return flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, nargs="+",
                   default=[1, 2, 4, 8, 16, 32, 64])
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 peak of the chip (v5e: 197)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dadiff_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
    from dadiff_tpu.dynamics.extractor import double_integrator_dynamics
    from dadiff_tpu.guides.sampling import ProjectionSpec
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.ops.pallas_planner import make_pallas_bo_sampler
    from dadiff_tpu.ops.projection import NormStats
    from dadiff_tpu.guides.sampling import conditions_for_initial_obs

    H, D, OBS, ACT, T = 32, 8, 6, 2, 100
    unet = TemporalUnet(transition_dim=D, dim=128, dim_mults=(1, 2, 4))
    diffusion = GaussianDiffusion(
        model=unet, horizon=H, observation_dim=OBS, action_dim=ACT,
        n_timesteps=T,
    )
    params = jax.device_put(diffusion.init_params(jax.random.PRNGKey(0)))
    A, B = double_integrator_dynamics(dt=0.1)
    P = jnp.asarray(
        ProjectionMatrixBuilder(A, B, 4, ACT).get_projection_matrix(H)
    )
    stats = NormStats.identity(OBS, ACT)

    results = []
    for proj in (False, True):
        spec = ProjectionSpec(state_dim=4) if proj else None
        for n in args.chains:
            plan = make_pallas_bo_sampler(
                diffusion,
                projection_spec=spec,
                P=P if proj else None,
                stats=stats,
                n_candidates=n,
                group_chains=max(n, 1),
            )
            obs = jnp.zeros((1, OBS))
            cond = conditions_for_initial_obs(obs, OBS, H, D)
            prepared = plan.prepare(params)

            def multi(K):
                def f(rng):
                    def body(acc, key):
                        out = plan(params, key, cond, prepared=prepared)
                        return acc + jnp.sum(out), None
                    acc, _ = lax.scan(
                        body, jnp.asarray(0.0), jax.random.split(rng, K)
                    )
                    return acc
                return jax.jit(f)

            f1, f2 = multi(4), multi(16)
            f1(jax.random.PRNGKey(0)).block_until_ready()
            f2(jax.random.PRNGKey(0)).block_until_ready()
            t1 = median_time(lambda i: f1(jax.random.PRNGKey(i)))
            t2 = median_time(lambda i: f2(jax.random.PRNGKey(i)))
            dt_wave = (t2 - t1) / 12  # s per replan wave of n chains
            flops = unet_flops_per_step(unet, H, n) * T
            tflops = flops / dt_wave / 1e12
            row = {
                "projection": proj,
                "n_chains": n,
                "wave_ms": round(dt_wave * 1e3, 3),
                "chain_steps_per_s": round(T * n / dt_wave, 0),
                "per_chain_ms": round(dt_wave / n * 1e3, 3),
                "tflops": round(tflops, 1),
                "mfu_pct": round(100 * tflops / args.peak_tflops, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
