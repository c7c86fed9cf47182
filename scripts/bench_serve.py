#!/usr/bin/env python
"""Measure concurrent-serving latency: 1 client vs K concurrent clients.

VERDICT r2 #8 done-criterion: with micro-batching, 4 concurrent clients
should see < 2x the single-client replan latency (vs ~4x under round-2's
serialized server). Starts the server in-process (policy on the default
device), drives real TCP clients, prints one JSON line.

    python scripts/bench_serve.py --checkpoint ... --dataset ... \
        --policy-type dynamics-aware --n-candidates 8 [--clients 4]
"""

try:
    import _path  # noqa: F401
except ImportError:
    pass
import json
import socket
import statistics
import sys
import threading
import time

sys.path.insert(0, ".")


def _rpc(f, req):
    f.write((json.dumps(req) + "\n").encode())
    f.flush()
    return json.loads(f.readline())


def _client_latencies(port, n_requests, obs_dim, start_evt=None):
    lats = []
    with socket.create_connection(("127.0.0.1", port), timeout=600) as c:
        f = c.makefile("rwb")
        _rpc(f, {"ping": True})
        # one warm-up replan (compile) outside the timed window
        _rpc(f, {"obs": [0.05] * obs_dim, "plan": True})
        if start_evt is not None:
            start_evt.wait()
        for i in range(n_requests):
            t0 = time.perf_counter()
            _rpc(f, {"obs": [0.01 * (i + 1)] * obs_dim, "plan": True})
            lats.append(time.perf_counter() - t0)
    return lats


def main(argv=None):
    from scripts.serve import build_server_parser, serve
    from dadiff_tpu.cli import (
        ENV_TO_DATASET,
        _select_device,
        build_policy_from_args,
        load_model,
    )

    parser = build_server_parser()
    parser.add_argument("--clients", type=int, default=4)
    parser.add_argument("--requests-per-client", type=int, default=8)
    args = parser.parse_args(argv)

    _select_device(args.device)
    dataset_spec = args.dataset or ENV_TO_DATASET.get(args.env)
    diffusion, params, dataset = load_model(
        args.checkpoint, dataset_spec, use_ema=args.use_ema
    )
    if args.sampling_timesteps is None:
        args.sampling_timesteps = 200
    sampling_timesteps = min(args.sampling_timesteps, diffusion.n_timesteps)
    policy = build_policy_from_args(
        args, diffusion, params, dataset, dataset_spec, sampling_timesteps
    )
    obs_dim = diffusion.observation_dim
    K = args.clients
    R = args.requests_per_client

    def run_phase(concurrency, n_clients):
        port_box = {}
        ready = threading.Event()
        total = n_clients * (R + 2)  # + ping + warmup per client
        srv = threading.Thread(
            target=serve,
            args=(policy, "127.0.0.1", 0),
            kwargs={
                "max_requests": total,
                "ready_cb": lambda p: (port_box.update(port=p), ready.set()),
                "concurrency": concurrency,
                "window_ms": args.batch_window_ms,
                "max_batch": args.max_batch,
            },
            daemon=True,
        )
        srv.start()
        assert ready.wait(timeout=600)
        if n_clients == 1:
            lats = _client_latencies(port_box["port"], R, obs_dim)
        else:
            start = threading.Event()
            results = [None] * n_clients
            ts = []
            for i in range(n_clients):
                def w(i=i):
                    results[i] = _client_latencies(
                        port_box["port"], R, obs_dim, start
                    )
                t = threading.Thread(target=w, daemon=True)
                t.start()
                ts.append(t)
                time.sleep(0.5)  # connections established before the burst
            start.set()
            for t in ts:
                t.join(timeout=900)
            lats = [x for r in results if r for x in r]
        srv.join(timeout=60)
        return lats

    solo = run_phase(concurrency=1, n_clients=1)
    # warm-start policies carry per-client warm state the micro-batcher
    # cannot fold (serve() refuses); measure their concurrent story as
    # what it IS — serialized service — and say so in the output
    concurrent_mode = "micro-batched"
    if getattr(args, "warm_start_t", None) is not None:
        concurrent_mode = "serialized (micro-batching does not compose " \
                          "with per-client warm-start state)"
        batched = run_phase(concurrency=1, n_clients=K)
    else:
        batched = run_phase(concurrency=K, n_clients=K)
    serialized = run_phase(concurrency=1, n_clients=1)  # stability re-check

    def _p(lats, q):
        return round(sorted(lats)[min(len(lats) - 1,
                                      int(q * len(lats)))] * 1e3, 1)

    solo_all = solo + serialized
    solo_ms = statistics.median(solo_all) * 1e3
    conc_ms = statistics.median(batched) * 1e3
    print(json.dumps({
        "solo_replan_ms": round(solo_ms, 1),
        "solo_p50_ms": _p(solo_all, 0.50),
        "solo_p95_ms": _p(solo_all, 0.95),
        f"concurrent_{K}_replan_ms": round(conc_ms, 1),
        f"concurrent_{K}_p50_ms": _p(batched, 0.50),
        f"concurrent_{K}_p95_ms": _p(batched, 0.95),
        "slowdown_x": round(conc_ms / solo_ms, 2),
        "throughput_gain_vs_serialized_x": round(K * solo_ms / conc_ms, 2),
        "concurrent_mode": concurrent_mode,
        "target": "< 2.0 (vs ~%d under serialized serving)" % K,
        "n_candidates": args.n_candidates,
        "policy_type": args.policy_type,
        "sampler": args.sampler,
        "sampling_timesteps": args.sampling_timesteps,
        "warm_start_t": args.warm_start_t,
    }))


if __name__ == "__main__":
    main()
