#!/usr/bin/env python
"""Benchmark: denoise-step throughput of the flagship PointMaze planner.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: denoise steps/sec/chip for the canonical PointMaze U-Net
(h=32, dim=128, mults (1,2,4), T=100 — reference README.md:77-90 config) at
the reference's eval batch size of 1 (policies.py:217). The baseline is the
reference torch implementation measured on this machine's CPU
(BASELINE_MEASURED.json; the reference publishes no numbers, BASELINE.md).

Extra fields report batched planner throughput (the serving configuration —
BASELINE.json configs[4]) and the guided sampler with conditioning.
"""

import json
import os
import statistics
import sys
import time


def median_time(fn, n=7):
    """Median wall-clock of n fully-synchronized calls (the axon tunnel has
    high per-call variance; median is stable)."""
    times = []
    for i in range(n):
        t0 = time.time()
        out = fn(i)
        out.block_until_ready()
        times.append(time.time() - t0)
    return statistics.median(times)


def main():
    import jax
    import jax.numpy as jnp

    from dadiff_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from dadiff_tpu.guides.sampling import conditions_for_initial_obs, make_sampler
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    n_timesteps = 100
    unet = TemporalUnet(transition_dim=8, dim=128, dim_mults=(1, 2, 4))
    diffusion = GaussianDiffusion(
        model=unet, horizon=32, observation_dim=6, action_dim=2,
        n_timesteps=n_timesteps,
    )
    params = diffusion.init_params(jax.random.PRNGKey(0))

    # headline: batch-1 full reverse chain via the latency-tuned sampler
    # (hoisted time-MLP/coefficients; equivalence-tested vs the standard path
    # in tests/test_fast_sampler.py)
    from dadiff_tpu.models.fast_sampler import fast_p_sample_loop

    loop_b1 = jax.jit(
        lambda p, r: fast_p_sample_loop(
            diffusion.model, p, diffusion.schedule, r, (1, 32, 8)
        )
    )
    loop_b1(params, jax.random.PRNGKey(0)).block_until_ready()  # compile
    dt_b1 = median_time(lambda i: loop_b1(params, jax.random.PRNGKey(i)))
    denoise_sps = n_timesteps / dt_b1

    std_b1 = jax.jit(lambda p, r: diffusion.p_sample_loop(p, r, (1, 32, 8)))
    std_b1(params, jax.random.PRNGKey(0)).block_until_ready()
    dt_std = median_time(lambda i: std_b1(params, jax.random.PRNGKey(i)))

    # serving: batched planner throughput
    batch = 256
    loop_bn = jax.jit(lambda p, r: diffusion.p_sample_loop(p, r, (batch, 32, 8)))
    loop_bn(params, jax.random.PRNGKey(0)).block_until_ready()
    dt_bn = median_time(lambda i: loop_bn(params, jax.random.PRNGKey(i)), n=5)
    batched_sample_sps = n_timesteps * batch / dt_bn

    # guided sampler (conditioning path used by policies)
    plan = make_sampler(diffusion)
    cond = conditions_for_initial_obs(jnp.zeros(6), 6, 32, 8)
    plan(params, jax.random.PRNGKey(0), cond).block_until_ready()
    dt_guided = median_time(lambda i: plan(params, jax.random.PRNGKey(i), cond))
    guided_sps = n_timesteps / dt_guided

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    vs_baseline = None
    baseline_b1 = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        baseline_b1 = baseline.get("torch_cpu_denoise_steps_per_sec_batch1")
        if baseline_b1:
            vs_baseline = denoise_sps / baseline_b1

    print(json.dumps({
        "metric": "denoise steps/sec/chip (PointMaze U-Net h=32, batch=1)",
        "value": round(denoise_sps, 1),
        "unit": "denoise steps/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "baseline_torch_cpu_batch1": baseline_b1,
        "standard_sampler_steps_per_sec": round(n_timesteps / dt_std, 1),
        "guided_sampler_steps_per_sec": round(guided_sps, 1),
        "batched_sample_steps_per_sec_b256": round(batched_sample_sps, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
