#!/usr/bin/env python
"""Benchmark the Pallas whole-chain megakernel on the real TPU vs the XLA
fast sampler (canonical PointMaze config: dim=128, mults (1,2,4), h=32,
T=100, batch 1)."""

import json
import statistics
import time

import jax
import jax.numpy as jnp

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass

from dadiff_tpu.cli import enable_compilation_cache

enable_compilation_cache()

from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.fast_sampler import fast_p_sample_loop
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.ops.pallas_unet import pallas_p_sample_loop


def median_time(fn, n=9):
    times = []
    for i in range(n):
        t0 = time.time()
        fn(i).block_until_ready()
        times.append(time.time() - t0)
    return statistics.median(times)


T = 100
unet = TemporalUnet(transition_dim=8, dim=128, dim_mults=(1, 2, 4))
d = GaussianDiffusion(model=unet, horizon=32, observation_dim=6,
                      action_dim=2, n_timesteps=T)
params = jax.device_put(d.init_params(jax.random.PRNGKey(0)))
shape = (1, 32, 8)

ref = jax.jit(lambda p, r: fast_p_sample_loop(unet, p, d.schedule, r, shape))
print("compiling XLA fast sampler...", flush=True)
ref(params, jax.random.PRNGKey(0)).block_until_ready()
dt_ref = median_time(lambda i: ref(params, jax.random.PRNGKey(i)))
print(f"xla fast sampler: {T / dt_ref:.1f} steps/s ({dt_ref * 1e3:.2f} ms)",
      flush=True)

results = {"xla_fast": round(T / dt_ref, 1)}
for wd, name in ((jnp.bfloat16, "mega_bf16"), (jnp.float32, "mega_f32")):
    try:
        mega = jax.jit(lambda p, r, _wd=wd: pallas_p_sample_loop(
            unet, p, d.schedule, r, shape, weight_dtype=_wd))
        print(f"compiling {name}...", flush=True)
        t0 = time.time()
        out = mega(params, jax.random.PRNGKey(0))
        out.block_until_ready()
        print(f"  compile+run {time.time() - t0:.1f}s", flush=True)
        dt = median_time(lambda i: mega(params, jax.random.PRNGKey(i)))
        gold = ref(params, jax.random.PRNGKey(42))
        test = mega(params, jax.random.PRNGKey(42))
        err = float(jnp.abs(test - gold).max())
        results[name] = round(T / dt, 1)
        print(f"{name}: {T / dt:.1f} steps/s ({dt * 1e3:.2f} ms) "
              f"max|err|={err:.4f}", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

print(json.dumps(results))
