#!/usr/bin/env python
"""Picard (parallel-in-time) vs sequential sampling: find the crossover.

VERDICT round-1 #9: Picard sampling shipped exact (3.5-4x fewer sequential
model calls) but with no measured wall-clock win at the flagship scale —
per-step cost there is op-overhead-bound, so batching 16-32 timesteps into
one model call is nearly free *relative* work but saves nothing absolute.

This probe measures sustained batch-1 wall-clock for both samplers across
model scale (dim), using bench.py's marginal-cost method (K back-to-back
chains inside one jitted program; per-chain time = (t(K2)-t(K1))/(K2-K1))
so the ~25-30 ms tunnel RPC per dispatch cancels out.

Expected shape of the result: as dim grows, per-step model cost grows toward
MXU-bound and the (window*B)-batched Picard sweep amortizes better; the
crossover dim is where Picard's wall-clock beats the sequential scan.

Writes results/picard_crossover.json and prints one line per config.
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_time(fn, n=5):
    times = []
    for i in range(n):
        t0 = time.time()
        fn(i).block_until_ready()
        times.append(time.time() - t0)
    return statistics.median(times)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs="+", default=[128, 256, 512])
    ap.add_argument("--device", type=str, default="tpu", choices=["tpu", "cpu"])
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax

    from dadiff_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.parallel_sampling import parallel_sample_loop
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    n_timesteps = 100
    horizon, trans = 32, 8
    shape = (1, horizon, trans)

    def sustained(chain_fn, params, k1=2, k2=8):
        def multi(K):
            def f(p, rng):
                def body(acc, key):
                    return acc + jnp.sum(chain_fn(p, key)), None
                acc, _ = lax.scan(body, jnp.asarray(0.0),
                                  jax.random.split(rng, K))
                return acc
            return jax.jit(f)
        f1, f2 = multi(k1), multi(k2)
        f1(params, jax.random.PRNGKey(0)).block_until_ready()
        f2(params, jax.random.PRNGKey(0)).block_until_ready()
        t1 = median_time(lambda i: f1(params, jax.random.PRNGKey(i)))
        t2 = median_time(lambda i: f2(params, jax.random.PRNGKey(i)))
        return (t2 - t1) / (k2 - k1)

    rows = []
    for dim in args.dims:
        unet = TemporalUnet(transition_dim=trans, dim=dim, dim_mults=(1, 2, 4))
        d = GaussianDiffusion(model=unet, horizon=horizon,
                              observation_dim=6, action_dim=2,
                              n_timesteps=n_timesteps)
        params = jax.device_put(d.init_params(jax.random.PRNGKey(0)))

        seq = lambda p, r: d.p_sample_loop(p, r, shape)

        def picard(p, r):
            out = parallel_sample_loop(
                d.apply, p, d.schedule, r, shape, window=25, tol=1e-2,
            )
            return out[0] if isinstance(out, tuple) else out

        dt_seq = sustained(seq, params)
        dt_pic = sustained(picard, params)
        row = {
            "dim": dim,
            "sequential_chain_ms": round(dt_seq * 1e3, 3),
            "picard_chain_ms": round(dt_pic * 1e3, 3),
            "picard_speedup": round(dt_seq / dt_pic, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"protocol": "sustained batch-1 chain cost, T=100, window=25, "
                       "tol=1e-2, marginal-cost method", "rows": rows}
    os.makedirs("results", exist_ok=True)
    with open("results/picard_crossover.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/picard_crossover.json")


if __name__ == "__main__":
    main()
