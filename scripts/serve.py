#!/usr/bin/env python
"""Planning server: a trained policy behind newline-delimited JSON over TCP.

The deployment surface the reference lacks entirely: load a checkpoint once
(params committed to device, samplers jit-compiled on the first request),
then serve actions/plans to any client that can open a socket. All evaluate
CLI knobs apply — policy type, best-of-N, samplers, warm-start replanning,
wall-aware projection.

    python scripts/serve.py --checkpoint logs/.../checkpoint_step_N.pt \
        --dataset npz:data/pointmaze_umaze_expert.npz \
        --policy-type dynamics-aware --n-candidates 8 --port 7033

Protocol (one JSON object per line, response per request):
    {"obs": [..flat obs..]}            -> {"action": [...], "plan_ms": t}
    {"obs": {"observation": [...],     (dict observations are flattened the
             "desired_goal": [...]}}    same way the eval harness does)
    {"obs": [...], "plan": true}       -> adds "plan": the full normalized
                                          (H, D) trajectory of this replan
    {"reset": true}                    -> {"ok": true}  (new episode: clears
                                          the action buffer and warm state)
    {"ping": true}                     -> {"ok": true, "policy": "...", ...}

One request at a time (the TPU program is serialized anyway); malformed
requests get {"error": "..."} and the connection stays up.
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass
import argparse
import json
import socket
import sys
import time

sys.path.insert(0, ".")


def build_server_parser() -> argparse.ArgumentParser:
    from dadiff_tpu.cli import build_eval_parser

    p = build_eval_parser()
    p.description = "Serve a trained planning policy over TCP (JSON lines)"
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7033)
    p.add_argument("--max-requests", type=int, default=None,
                   help="exit after N requests (testing/batch jobs)")
    p.add_argument("--concurrency", type=int, default=1,
                   help="max concurrent client connections; > 1 enables "
                        "micro-batching: plan requests arriving within "
                        "--batch-window-ms fold into ONE batched TPU call "
                        "(dadiff_tpu/serving.py), bit-identical to solo "
                        "serving")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="how long the batcher waits to fold concurrent "
                        "plan requests into one call")
    p.add_argument("--max-batch", type=int, default=8,
                   help="max plan requests folded into one batched call")
    return p


def make_handler(policy):
    """Request dict -> response dict (pure; no socket concerns)."""
    import numpy as np

    def handle(req: dict) -> dict:
        if req.get("ping"):
            return {
                "ok": True,
                "policy": type(policy).__name__,
                "horizon": policy.horizon,
                "observation_dim": policy.observation_dim,
                "action_dim": policy.action_dim,
            }
        if req.get("reset"):
            policy.reset()
            return {"ok": True}
        if "obs" not in req:
            return {"error": "request needs 'obs', 'reset', or 'ping'"}
        obs = req["obs"]
        if isinstance(obs, dict):
            obs = {k: np.asarray(v, np.float32) for k, v in obs.items()}
        else:
            obs = np.asarray(obs, np.float32)
        t0 = time.perf_counter()
        if req.get("plan"):
            # full replan: return the trajectory AND refill the buffer from it
            traj = policy.plan(obs)
            policy.action_buffer.clear()
            policy._fill_action_buffer(traj)
            policy._actions_taken += 1
            action = policy.action_buffer.pop(0)
            resp = {"plan": np.asarray(traj)[0].tolist()}
        else:
            action = policy.get_action(obs)
            resp = {}
        resp.update({
            "action": np.ravel(action).tolist(),
            "plan_ms": round((time.perf_counter() - t0) * 1e3, 2),
        })
        return resp

    return handle


def _serve_connection(conn, handle, counter, max_requests):
    with conn, conn.makefile("rwb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                resp = handle(json.loads(line))
            except Exception as e:  # malformed request; keep serving
                resp = {"error": f"{type(e).__name__}: {e}"}
            f.write((json.dumps(resp) + "\n").encode())
            f.flush()
            if counter.bump() and max_requests is not None:
                return


class _Counter:
    def __init__(self, limit):
        import threading

        self.limit = limit
        self.n = 0
        self._lock = threading.Lock()

    def bump(self) -> bool:
        """Increment; True when the limit is reached."""
        with self._lock:
            self.n += 1
            return self.limit is not None and self.n >= self.limit

    def done(self) -> bool:
        with self._lock:
            return self.limit is not None and self.n >= self.limit


def serve(policy, host: str, port: int, max_requests=None, ready_cb=None,
          concurrency: int = 1, window_ms: float = 5.0, max_batch: int = 8):
    """Accept loop. ``concurrency == 1``: one client at a time (round-2
    behavior). ``concurrency > 1``: each connection gets its own policy
    session (independent RNG stream / action buffer) and concurrent replans
    micro-batch into one TPU call (dadiff_tpu/serving.py)."""
    import threading

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(max(1, concurrency))
    bound_port = srv.getsockname()[1]
    print(f"serving on {host}:{bound_port} (concurrency={concurrency})",
          flush=True)
    if ready_cb is not None:
        ready_cb(bound_port)
    counter = _Counter(max_requests)

    batcher = None
    if concurrency > 1:
        from dadiff_tpu.serving import BatchedPlanner

        batcher = BatchedPlanner(
            policy, max_batch=max_batch, window_ms=window_ms
        )

    srv.settimeout(0.2)
    threads = []
    next_session = 0
    try:
        while not counter.done():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                threads = [t for t in threads if t.is_alive()]
                continue
            if concurrency <= 1:
                handle = make_handler(policy)
                _serve_connection(conn, handle, counter, max_requests)
            else:
                session = batcher.session(seed=next_session)
                next_session += 1
                handle = make_handler(session)
                t = threading.Thread(
                    target=_serve_connection,
                    args=(conn, handle, counter, max_requests),
                    daemon=True,
                )
                t.start()
                threads.append(t)
    finally:
        for t in threads:
            t.join(timeout=5.0)
        if batcher is not None:
            batcher.close()
        srv.close()
    return counter.n


def main(argv=None):
    parser = build_server_parser()
    args = parser.parse_args(argv)

    from dadiff_tpu.cli import (
        ENV_TO_DATASET,
        _select_device,
        build_policy_from_args,
        load_model,
    )

    _select_device(args.device)
    dataset_spec = args.dataset or ENV_TO_DATASET.get(args.env)
    if dataset_spec is None:
        raise SystemExit(f"No default dataset for {args.env}; pass --dataset")
    diffusion, params, dataset = load_model(
        args.checkpoint, dataset_spec, use_ema=args.use_ema
    )
    if args.sampling_timesteps is None:
        args.sampling_timesteps = 4 if args.sampler == "consistency" else 200
    sampling_timesteps = min(args.sampling_timesteps, diffusion.n_timesteps)
    policy = build_policy_from_args(
        args, diffusion, params, dataset, dataset_spec, sampling_timesteps
    )
    serve(policy, args.host, args.port, max_requests=args.max_requests,
          concurrency=args.concurrency, window_ms=args.batch_window_ms,
          max_batch=args.max_batch)


if __name__ == "__main__":
    main()
