"""Planning server (scripts/serve.py): JSON-lines-over-TCP deployment
surface. New capability vs the reference (no serving story at all)."""

import json
import socket
import sys
import threading

import numpy as np
import jax
import pytest

sys.path.insert(0, ".")

from dadiff_tpu.guides.policies import MPCPolicy
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet

from scripts.serve import make_handler, serve


class _IdentityNormalizer:
    obs_mean = np.zeros(6, np.float32)
    obs_std = np.ones(6, np.float32)
    action_mean = np.zeros(2, np.float32)
    action_std = np.ones(2, np.float32)

    def normalize_observations(self, x):
        return np.asarray(x, np.float32)

    def unnormalize_observations(self, x):
        return np.asarray(x, np.float32)

    def unnormalize_actions(self, x):
        return np.asarray(x, np.float32)


@pytest.fixture(scope="module")
def policy():
    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=16, observation_dim=6, action_dim=2, n_timesteps=10
    )
    params = d.init_params(jax.random.PRNGKey(0))
    return MPCPolicy(
        d, _IdentityNormalizer(), params=params, action_horizon=4,
        warm_start_t=4,
    )


def test_handler_direct(policy):
    handle = make_handler(policy)
    info = handle({"ping": True})
    assert info["ok"] and info["action_dim"] == 2
    resp = handle({"obs": [0.0] * 6})
    assert len(resp["action"]) == 2 and resp["plan_ms"] > 0
    resp = handle({"obs": {"observation": [0.0] * 4, "desired_goal": [0.0] * 2}})
    assert len(resp["action"]) == 2
    resp = handle({"obs": [0.0] * 6, "plan": True})
    assert np.asarray(resp["plan"]).shape == (16, 8)
    assert handle({"reset": True}) == {"ok": True}
    assert policy._last_plan is None  # reset cleared warm state
    assert "error" in handle({"nonsense": 1})


def test_server_roundtrip(policy):
    policy.reset()
    n_requests = 4
    port_box = {}
    ready = threading.Event()

    def ready_cb(port):
        port_box["port"] = port
        ready.set()

    t = threading.Thread(
        target=serve,
        args=(policy, "127.0.0.1", 0),
        kwargs={"max_requests": n_requests, "ready_cb": ready_cb},
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=30)

    with socket.create_connection(("127.0.0.1", port_box["port"]), timeout=60) as c:
        f = c.makefile("rwb")

        def rpc(req):
            f.write((json.dumps(req) + "\n").encode())
            f.flush()
            return json.loads(f.readline())

        assert rpc({"ping": True})["ok"]
        a1 = rpc({"obs": [0.1] * 6})
        assert len(a1["action"]) == 2
        a2 = rpc({"obs": [0.1] * 6})  # buffered action, no replan
        assert len(a2["action"]) == 2 and a2["plan_ms"] <= a1["plan_ms"]
        assert rpc({"reset": True})["ok"]
    t.join(timeout=30)
    assert not t.is_alive()
