#!/usr/bin/env python
"""Multi-HOST (multi-process) dryrun: execution evidence for
parallel/distributed.py (VERDICT r3 weak #8).

Launches 2 OS processes, each owning 4 virtual CPU devices, joins them
into one 8-device jax.distributed runtime via
``initialize_distributed(coordinator, 2, pid)``, builds the global
('dp',) mesh, and runs the REAL fused train step
(utils/training.make_train_step) on a deterministic global batch with
each process feeding only its local shard
(jax.make_array_from_process_local_data). The parent then computes the
same step single-process on 8 local devices and asserts identical loss —
proving the cross-process collective path computes the same math as the
single-process GSPMD path.

What the simulation can and cannot see (docs/parallelism.md): it
exercises the coordinator handshake, global mesh construction from
per-process local devices, process-local data feeding, and cross-process
all-reduce semantics. It cannot see ICI vs DCN topology or TPU-pod
metadata autodetection (``auto=True``), which need real multi-host
hardware.

    python scripts/dryrun_multihost.py            # parent: spawn + verify
    (child mode is internal: --role child ...)
"""

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVICES_PER_PROC = 4
NUM_PROCS = 2


def _make_batch(global_batch=16, horizon=8, dim=4):
    import numpy as np

    return np.random.RandomState(0).randn(
        global_batch, horizon, dim
    ).astype("float32")


def _build():
    """Tiny diffusion model + the real fused train step + loss."""
    import jax

    from dadiff_tpu.losses import build_loss
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.utils.training import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    unet = TemporalUnet(transition_dim=4, dim=8, dim_mults=(1, 2))
    diffusion = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=3, action_dim=1, n_timesteps=10
    )
    params = diffusion.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(lr=1e-3)
    state = TrainState(
        params=params, ema_params=params, opt_state=tx.init(params), step=0
    )
    loss_fn, _ = build_loss(diffusion)
    step = make_train_step(loss_fn, tx, donate=False)
    return diffusion, state, step


def _replicate(tree, mesh):
    """Lift a process-local pytree into REPLICATED global arrays on the
    mesh (multi-process jit requires every input to be a global array)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())

    def lift(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, rep, lambda idx: arr[idx]
        )

    return jax.tree_util.tree_map(lift, tree)


def run_child(args):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    )
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dadiff_tpu.parallel.distributed import initialize_distributed

    ok = initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=NUM_PROCS,
        process_id=args.process_id,
    )
    assert ok, "initialize_distributed returned False in child"
    assert jax.process_count() == NUM_PROCS, jax.process_count()
    assert jax.device_count() == NUM_PROCS * DEVICES_PER_PROC
    assert jax.local_device_count() == DEVICES_PER_PROC

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))
    _, state, step = _build()
    state = _replicate(state, mesh)
    rng = _replicate(jax.random.PRNGKey(42), mesh)

    batch = _make_batch()
    local = np.array_split(batch, NUM_PROCS)[args.process_id]
    sharding = NamedSharding(mesh, PartitionSpec("dp"))
    global_batch = jax.make_array_from_process_local_data(sharding, local)

    state, metrics = step(state, {"conditions": global_batch}, rng)
    loss = float(metrics["total"])
    # every process must observe the identical global loss
    print(f"CHILD {args.process_id} LOSS {loss:.10f}", flush=True)


def run_parent():
    # reference value: same step, single process, 8 local devices
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={NUM_PROCS * DEVICES_PER_PROC}"
    )
    ref = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--role", "ref"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    if ref.returncode != 0:
        print(ref.stdout)
        print(ref.stderr)
        raise SystemExit("reference (single-process) run failed")
    ref_loss = [l for l in ref.stdout.splitlines() if l.startswith("REF LOSS")]
    ref_loss = float(ref_loss[0].split()[-1])

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    procs = []
    for pid in range(NUM_PROCS):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--role", "child",
             "--coordinator", coordinator, "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=dict(os.environ),
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    losses = {}
    for rc, out, err in outs:
        if rc != 0:
            print(out)
            print(err)
            raise SystemExit("child failed")
        for line in out.splitlines():
            if line.startswith("CHILD"):
                _, pid, _, loss = line.split()
                losses[int(pid)] = float(loss)

    assert len(losses) == NUM_PROCS, losses
    vals = list(losses.values())
    assert abs(vals[0] - vals[1]) < 1e-9, \
        f"processes disagree on global loss: {losses}"
    assert abs(vals[0] - ref_loss) < 1e-6, \
        f"multi-process loss {vals[0]} != single-process {ref_loss}"
    print(f"OK multihost dryrun: {NUM_PROCS} processes x "
          f"{DEVICES_PER_PROC} devices, fused train step loss "
          f"{vals[0]:.10f} == single-process {ref_loss:.10f}")


def run_ref():
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    assert jax.device_count() == NUM_PROCS * DEVICES_PER_PROC
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))
    _, state, step = _build()
    batch = jax.device_put(
        _make_batch(), NamedSharding(mesh, PartitionSpec("dp"))
    )
    state, metrics = step(state, {"conditions": batch},
                          jax.random.PRNGKey(42))
    print(f"REF LOSS {float(metrics['total']):.10f}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--role", default="parent",
                   choices=["parent", "child", "ref"])
    p.add_argument("--coordinator", default=None)
    p.add_argument("--process-id", type=int, default=0)
    args = p.parse_args()
    if args.role == "parent":
        run_parent()
    elif args.role == "ref":
        run_ref()
    else:
        run_child(args)


if __name__ == "__main__":
    main()
