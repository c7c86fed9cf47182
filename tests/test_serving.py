"""Micro-batched concurrent planning (dadiff_tpu/serving.py + serve.py
--concurrency): concurrent clients fold into one TPU call, bit-identical
to solo serving."""

import json
import socket
import threading

import numpy as np
import jax
import pytest

import sys

sys.path.insert(0, ".")

from dadiff_tpu.guides.policies import MPCPolicy
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.serving import BatchedPlanner

from scripts.serve import serve
from tests.test_serve import _IdentityNormalizer


def _make_policy(**kw):
    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=16, observation_dim=6, action_dim=2, n_timesteps=10
    )
    params = d.init_params(jax.random.PRNGKey(0))
    return MPCPolicy(
        d, _IdentityNormalizer(), params=params, action_horizon=4, **kw
    )


@pytest.fixture(scope="module")
def planner():
    p = BatchedPlanner(_make_policy(), max_batch=4, window_ms=30.0)
    yield p
    p.close()


def test_sessions_independent_and_deterministic(planner):
    # NOTE: the FIRST buffered action of a replan is the conditioning-zeroed
    # one (reference parity quirk), identical across sessions — compare the
    # full plan trajectories instead.
    obs = [0.2] * 6
    p1 = planner.session(seed=1).plan(obs)
    p2 = planner.session(seed=2).plan(obs)
    # different RNG streams -> different plans
    assert not np.allclose(p1, p2)
    # same seed again -> identical
    np.testing.assert_array_equal(planner.session(seed=1).plan(obs), p1)


def test_batched_identical_to_solo(planner):
    """4 concurrent replans fold into fewer calls AND give exactly the
    plans each session gets when served alone."""
    obs = [0.3] * 6

    # solo: four sessions, sequential replans
    solo = [planner.session(seed=10 + i).plan(obs) for i in range(4)]

    calls_before = planner.n_calls
    sessions = [planner.session(seed=10 + i) for i in range(4)]
    results = [None] * 4
    barrier = threading.Barrier(4)

    def worker(i):
        barrier.wait()
        results[i] = sessions[i].plan(obs)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    new_calls = planner.n_calls - calls_before
    assert new_calls < 4  # actually batched
    for i in range(4):
        np.testing.assert_array_equal(results[i], solo[i])


def test_batching_rejects_warm_start():
    with pytest.raises(ValueError, match="warm-start"):
        BatchedPlanner(_make_policy(warm_start_t=4))


def test_concurrent_server_end_to_end():
    policy = _make_policy()
    port_box = {}
    ready = threading.Event()

    def ready_cb(port):
        port_box["port"] = port
        ready.set()

    n_clients = 3
    n_requests = n_clients * 2
    t = threading.Thread(
        target=serve,
        args=(policy, "127.0.0.1", 0),
        kwargs={
            "max_requests": n_requests,
            "ready_cb": ready_cb,
            "concurrency": 4,
            "window_ms": 30.0,
        },
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=60)

    actions = [None] * n_clients
    errs = []

    def client(i):
        try:
            with socket.create_connection(
                ("127.0.0.1", port_box["port"]), timeout=120
            ) as c:
                f = c.makefile("rwb")

                def rpc(req):
                    f.write((json.dumps(req) + "\n").encode())
                    f.flush()
                    return json.loads(f.readline())

                assert rpc({"ping": True})["ok"]
                actions[i] = rpc(
                    {"obs": [0.1 * (i + 1)] * 6, "plan": True}
                )["plan"]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for c in threads:
        c.start()
    for c in threads:
        c.join(timeout=120)
    t.join(timeout=60)
    assert not errs
    assert all(a is not None and np.asarray(a).shape == (16, 8)
               for a in actions)
    # distinct observations + distinct session streams -> distinct plans
    assert not np.allclose(actions[0], actions[1])
