#!/usr/bin/env python
"""Round-2 perf probe: batch-1 denoise-chain variants on the real TPU.

The batch-1 chain is weight-bandwidth-bound: ~16M params (~64MB f32) stream
from HBM every step. Variants probe the two levers: stored-weight dtype
(bf16 halves bytes/step) and scan unrolling (cross-step overlap).

Usage: python scripts/perf_probe.py [--variants v1,v2,...]
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass

import argparse
import json
import statistics
import time


def median_time(fn, n=7):
    times = []
    for i in range(n):
        t0 = time.time()
        fn(i).block_until_ready()
        times.append(time.time() - t0)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str, default="f32,bf16,f32u4,bf16u4,bf16u8")
    ap.add_argument("--timesteps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dadiff_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from dadiff_tpu.models.diffusion import GaussianDiffusion, default_timesteps
    from dadiff_tpu.models.fast_sampler import fast_p_sample_loop
    from dadiff_tpu.models.fused_unet import _time_embedding, unet_apply_fused
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    T = args.timesteps
    unet = TemporalUnet(transition_dim=8, dim=128, dim_mults=(1, 2, 4))
    diffusion = GaussianDiffusion(
        model=unet, horizon=32, observation_dim=6, action_dim=2, n_timesteps=T,
    )
    params = jax.device_put(diffusion.init_params(jax.random.PRNGKey(0)))
    schedule = diffusion.schedule
    shape = (1, 32, 8)

    def make_loop(dtype, unroll):
        """fast_p_sample_loop clone with stored-dtype params + scan unroll."""
        p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

        def loop(p, rng):
            ts = default_timesteps(T)
            rng, init_key, noise_key = jax.random.split(rng, 3)
            x = jax.random.normal(init_key, shape)
            step_noise = jax.random.normal(noise_key, (T,) + shape)
            t_embs = _time_embedding(p, ts, unet.dim).astype(dtype)

            def g(a):
                return a[ts].reshape(T, 1, 1, 1)

            recip = g(schedule.sqrt_recip_alphas_cumprod)
            recipm1 = g(schedule.sqrt_recipm1_alphas_cumprod)
            c1 = g(schedule.posterior_mean_coef1)
            c2 = g(schedule.posterior_mean_coef2)
            sigma = g(jnp.exp(0.5 * schedule.posterior_log_variance_clipped))
            sigma = sigma * (ts != 0).astype(jnp.float32).reshape(T, 1, 1, 1)

            def body(x, inputs):
                t_emb, noise, r, rm1, c1t, c2t, st = inputs
                out = unet_apply_fused(
                    unet, p, x.astype(dtype), t_emb=t_emb[None], use_pallas=False
                ).astype(jnp.float32)
                x_recon = jnp.clip(r * x - rm1 * out, -1.0, 1.0)
                return c1t * x_recon + c2t * x + st * noise, None

            x, _ = lax.scan(
                body, x, (t_embs, step_noise, recip, recipm1, c1, c2, sigma),
                unroll=unroll,
            )
            return x

        return jax.jit(loop), p

    variants = {}
    for v in args.variants.split(","):
        v = v.strip()
        if v == "f32":
            variants[v] = make_loop(jnp.float32, 1)
        elif v == "bf16":
            variants[v] = make_loop(jnp.bfloat16, 1)
        elif v.startswith("f32u"):
            variants[v] = make_loop(jnp.float32, int(v[4:]))
        elif v.startswith("bf16u"):
            variants[v] = make_loop(jnp.bfloat16, int(v[5:]))

    # reference: the shipped fast sampler
    ref = jax.jit(
        lambda p, r: fast_p_sample_loop(unet, p, schedule, r, shape)
    )
    print("compiling shipped fast_sampler...", flush=True)
    ref(params, jax.random.PRNGKey(0)).block_until_ready()
    dt = median_time(lambda i: ref(params, jax.random.PRNGKey(i)))
    results = {"shipped_fast_sampler": round(T / dt, 1)}
    print(f"shipped_fast_sampler: {T / dt:.1f} steps/s ({dt * 1e3:.2f} ms)",
          flush=True)

    gold = ref(params, jax.random.PRNGKey(42))

    for name, (loop, p) in variants.items():
        print(f"compiling {name}...", flush=True)
        t0 = time.time()
        out = loop(p, jax.random.PRNGKey(42))
        out.block_until_ready()
        print(f"  compile+run {time.time() - t0:.1f}s", flush=True)
        dt = median_time(lambda i: loop(p, jax.random.PRNGKey(i)))
        err = float(jnp.abs(out - gold).max())
        results[name] = round(T / dt, 1)
        print(f"{name}: {T / dt:.1f} steps/s ({dt * 1e3:.2f} ms)  "
              f"max|out-gold|={err:.4f}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
