"""Micro-batched concurrent planning: fold plan requests from many clients
into one TPU call.

Round 2's planning server (scripts/serve.py) handled one connection at a
time: N concurrent clients serialized, each paying its own TPU dispatch
(~30 ms RPC on a tunneled chip). Here a single batcher thread collects the
plan requests that arrive within a small window and executes them as ONE
vmapped sampler call, so K concurrent clients cost ~one client's latency.

Exactness: the batched call vmaps the SAME unjitted sampler each solo call
uses, over (rng, conditions) lanes. JAX's vmap semantics guarantee
``vmap(f)(keys, xs)[i] == f(keys[i], xs[i])`` including for PRNG draws, so
a client's plan is bit-identical whether it was served alone or folded into
any batch — verified in tests/test_serving.py. Batch sizes are padded to
powers of two to bound the number of compiled programs.

No reference counterpart: the reference has no serving surface at all (its
eval loop is a script, evaluate.py:206-269).
"""

from __future__ import annotations

import copy
import queue
import threading
from typing import List, Optional

import numpy as np


class _PlanRequest:
    __slots__ = ("key", "values", "event", "result", "error")

    def __init__(self, key, values):
        self.key = key
        self.values = values  # (n_candidates, H, D) conditioning values
        self.event = threading.Event()
        self.result = None
        self.error = None


class BatchedPlanner:
    """Shared batcher over one policy's sampler configuration.

    Build from a fully-configured template policy (guides/policies.py);
    call :meth:`session` once per client connection to get an independent
    policy clone (own RNG stream, action buffer, warm state) whose replans
    route through the shared micro-batch queue.
    """

    def __init__(
        self,
        policy,
        *,
        max_batch: int = 8,
        window_ms: float = 5.0,
        prewarm: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        from dadiff_tpu.guides.sampling import Conditions, make_sampler

        self.policy = policy
        self.max_batch = int(max_batch)
        self.window_s = float(window_ms) / 1e3
        cfg = getattr(policy, "_sampler_config", None)
        if cfg is None:
            raise ValueError(
                "policy does not expose _sampler_config; construct it via "
                "guides/policies.GuidedPolicy (or subclasses)"
            )
        if cfg.get("warm_start_from") or getattr(policy, "warm_start_auto",
                                                 False):
            raise ValueError(
                "micro-batching does not compose with warm-start replanning "
                "(per-client x_init lanes); serve warm-start policies "
                "single-stream"
            )

        plan1 = make_sampler(**{**cfg, "jit": True, "warm_start_from": None})
        # jit=True above only builds the solo path for fallback; the batched
        # path vmaps the unjitted body:
        plan_body = make_sampler(
            **{**cfg, "jit": False, "warm_start_from": None}
        )
        params = policy.params
        P = getattr(policy, "_P", None)
        stats = getattr(policy, "_stats", None)
        horizon, trans_dim = policy.horizon, policy.transition_dim
        mask = jnp.zeros((horizon,), bool).at[0].set(True)

        def lane(key, values):
            cond = Conditions(values=values, mask=mask)
            return plan_body(params, key, cond, P, stats)

        self._vplan = jax.jit(jax.vmap(lane))
        self._solo_plan = plan1
        self._jnp = jnp
        self._jax = jax

        if prewarm:
            # compile every padded batch shape (powers of two up to
            # max_batch) at construction, so the first concurrent burst a
            # live server sees pays zero compiles — without this, one
            # client's p95 eats a multi-second compile (measured: 31 s
            # p95 on the first 4-client burst, RESULTS.md [r5] serving)
            k0 = jax.random.PRNGKey(0)
            v0 = jnp.zeros((horizon, trans_dim), jnp.float32)
            k_pad = 1
            while True:
                jax.block_until_ready(self._vplan(
                    jnp.stack([k0] * k_pad), jnp.stack([v0] * k_pad)
                ))
                if k_pad >= self.max_batch:
                    break
                k_pad *= 2

        self._queue: "queue.Queue[_PlanRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        # instrumentation (read by tests and the server's ping response)
        self.n_calls = 0
        self.n_requests = 0
        self.batch_sizes: List[int] = []

    # -- client surface -----------------------------------------------------

    def session(self, seed: int = 0):
        """An independent policy clone whose replans go through the batcher."""
        import jax

        sess = copy.copy(self.policy)
        sess._rng = jax.random.PRNGKey(seed)
        sess.action_buffer = []
        sess._planned_obs = []
        sess._last_plan = None
        sess._actions_taken = 0
        sess._plan = self._submit_plan
        sess._plan_warm = None
        return sess

    def _submit_plan(self, params, key, conditions, P=None, stats=None):
        """make_sampler-compatible plan fn routed through the batch queue.

        ``params``/``P``/``stats`` are ignored: every session shares the
        batcher's device-committed copies (same checkpoint by construction).
        """
        values = np.asarray(conditions.values)
        if values.ndim == 2:
            values = values[None]
        req = _PlanRequest(key, values)
        self._queue.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    # -- batcher thread -------------------------------------------------------

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = _now() + self.window_s
            while len(batch) < self.max_batch:
                remaining = deadline - _now()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._execute(batch)
            except Exception as e:  # surface to every waiter
                for req in batch:
                    req.error = e
                    req.event.set()

    def _execute(self, batch: List[_PlanRequest]):
        jnp = self._jnp
        jax = self._jax
        K = len(batch)
        # pad to the next power of two: bounded compile count
        K_pad = 1
        while K_pad < K:
            K_pad *= 2
        keys = jnp.stack(
            [r.key for r in batch] + [batch[0].key] * (K_pad - K)
        )
        values = jnp.asarray(
            np.stack([r.values for r in batch]
                     + [batch[0].values] * (K_pad - K))
        )
        out = np.asarray(jax.block_until_ready(self._vplan(keys, values)))
        self.n_calls += 1
        self.n_requests += K
        self.batch_sizes.append(K)
        for i, req in enumerate(batch):
            req.result = out[i]
            req.event.set()

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2.0)


def _now():
    import time

    return time.monotonic()
