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


def serve(policy, host: str, port: int, max_requests=None, ready_cb=None):
    """Accept loop: one client at a time, one JSON line per request."""
    handle = make_handler(policy)
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    bound_port = srv.getsockname()[1]
    print(f"serving on {host}:{bound_port}", flush=True)
    if ready_cb is not None:
        ready_cb(bound_port)
    served = 0
    try:
        while max_requests is None or served < max_requests:
            conn, addr = srv.accept()
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
                    served += 1
                    if max_requests is not None and served >= max_requests:
                        break
    finally:
        srv.close()
    return served


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
    sampling_timesteps = min(args.sampling_timesteps, diffusion.n_timesteps)
    policy = build_policy_from_args(
        args, diffusion, params, dataset, dataset_spec, sampling_timesteps
    )
    serve(policy, args.host, args.port, max_requests=args.max_requests)


if __name__ == "__main__":
    main()
