#!/usr/bin/env python
"""Generate docs/tp_comm_volume.md: measured communication volume of the
tp-sharded Temporal U-Net forward at production scale (dim=256, h=32).

Compiles the sharded program on a virtual CPU device mesh (the collective
structure is decided by GSPMD partitioning, not the backend) and parses the
compiled HLO (parallel/comm_analysis.py). Run after any sharding-spec
change:

    python scripts/analyze_tp_comm.py [--dim 256] [--out docs/tp_comm_volume.md]
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:
    pass
import argparse
import os
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--mults", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--out", type=str, default="docs/tp_comm_volume.md")
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.parallel.comm_analysis import (
        collective_summary,
        weight_gather_violations,
    )
    from dadiff_tpu.parallel.mesh import make_mesh
    from dadiff_tpu.parallel.tp import shard_params_tp

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(args.batch, args.horizon, 8), jnp.float32)
    t = jnp.asarray(r.randint(0, 100, (args.batch,)), jnp.int32)

    rows = []
    for tp in (2, 4):
        dp = 8 // tp
        unet = TemporalUnet(
            transition_dim=8, dim=args.dim, dim_mults=tuple(args.mults),
            act_spec=("dp", None, "tp"),
        )
        params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
        mesh = make_mesh({"dp": dp, "tp": tp})
        sharded = shard_params_tp(params, mesh, tp_axis="tp")
        with jax.set_mesh(mesh):
            fwd = jax.jit(lambda p, x, t: unet.apply({"params": p}, x, t))
            compiled = fwd.lower(
                sharded,
                jax.device_put(x, NamedSharding(mesh, P("dp"))),
                jax.device_put(t, NamedSharding(mesh, P("dp"))),
            ).compile()
        s = collective_summary(compiled)
        violations = weight_gather_violations(s, params)
        act_bytes = args.batch * args.horizon * args.dim * 4
        rows.append((tp, dp, n_params, s, violations, act_bytes))
        print(f"tp={tp}: {s} violations={violations}", flush=True)

    lines = [
        "# Measured tp communication volume (Temporal U-Net forward)",
        "",
        f"Config: dim={args.dim}, mults={tuple(args.mults)}, "
        f"h={args.horizon}, batch={args.batch}, transition_dim=8. Compiled "
        "on the 8-device virtual CPU mesh (GSPMD decides the collective "
        "structure; the backend does not). Parsed from compiled HLO by "
        "`parallel/comm_analysis.py`; regenerate with "
        "`python scripts/analyze_tp_comm.py`.",
        "",
        "| mesh | collective | count | result bytes/step |",
        "|---|---|---|---|",
    ]
    for tp, dp, n_params, s, violations, act_bytes in rows:
        mesh_s = f"dp={dp} tp={tp}"
        if not s:
            lines.append(f"| {mesh_s} | (none) | 0 | 0 |")
        for op, e in sorted(s.items()):
            lines.append(
                f"| {mesh_s} | {op} | {e['count']} | {e['bytes']:,} |"
            )
    lines += [
        "",
        "**Full-weight gather check:** "
        + (
            "no all-gather result matches any kernel's full element count "
            "in either configuration — the tp sharding never undoes itself "
            "by re-materializing whole weight tensors at use sites "
            "(asserted continuously in tests/test_tensor_parallel.py::"
            "test_tp_forward_collective_structure)."
            if all(not v for *_, v, _a in rows)
            else f"VIOLATIONS FOUND: {[v for *_, v, _a in rows]}"
        ),
        "",
        "Reading the numbers: the all-reduce volume is the psum of "
        "channel-contracted activations at tp boundaries; it scales with "
        "activation size (batch x rows x channels), not with the "
        f"parameter count ({rows[0][2]:,} params at dim={args.dim}), which "
        "is the point of tensor parallelism — weights stay put, "
        "activations move.",
    ]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
