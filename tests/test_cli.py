"""CLI end-to-end tests on CPU (tiny configs).

These exercise the same surfaces a user drives: train_main -> checkpoint ->
evaluate-style loading; config YAML overlay; value training.
"""

import json
import os

import numpy as np
import pytest

from dadiff_tpu.cli import (
    build_train_parser,
    load_model,
    train_main,
    train_value_main,
)
from dadiff_tpu.utils.config import apply_config_defaults, load_experiment_config


def test_train_main_end_to_end(tmp_path):
    log_dir = train_main([
        "--dataset", "synthetic:pointmaze:n=8,T=30",
        "--horizon", "8", "--dim", "8", "--dim-mults", "1", "2",
        "--n-timesteps", "10", "--n-epochs", "1", "--batch-size", "32",
        "--warmup-steps", "5", "--log-dir", str(tmp_path),
        "--device", "cpu", "--save-freq", "0",
    ])
    files = os.listdir(log_dir)
    assert "config.json" in files and "final_config.json" in files
    assert any(f.endswith(".pt") for f in files)
    assert any(f.endswith(".orbax") for f in files)
    assert "metrics.jsonl" in files

    # the exported checkpoint loads through the eval path
    pt = next(f for f in files if f.endswith(".pt"))
    diffusion, params, dataset = load_model(
        os.path.join(log_dir, pt), "synthetic:pointmaze:n=8,T=30"
    )
    assert diffusion.horizon == 8
    assert dataset.transition_dim == 8

    with open(os.path.join(log_dir, "final_config.json")) as f:
        final = json.load(f)
    assert final["loss_components"] == ["diffusion"]


def test_train_main_with_projection_loss(tmp_path):
    log_dir = train_main([
        "--dataset", "synthetic:pointmaze:n=8,T=30",
        "--horizon", "8", "--dim", "8", "--dim-mults", "1", "2",
        "--n-timesteps", "10", "--n-epochs", "1", "--batch-size", "32",
        "--projection-weight", "0.1",
        "--log-dir", str(tmp_path), "--device", "cpu", "--save-freq", "0",
    ])
    with open(os.path.join(log_dir, "final_config.json")) as f:
        final = json.load(f)
    assert final["loss_components"] == ["diffusion", "projection"]


def test_yaml_config_overlay(tmp_path):
    config = tmp_path / "exp.yaml"
    config.write_text(
        """
dataset:
  name: "synthetic:pointmaze:n=4,T=20"
  horizon: 8
model:
  dim: 16
  dim_mults: [1, 2]
training:
  batch_size: 16
  n_epochs: 3
"""
    )
    parser = build_train_parser()
    argv = ["--config", str(config), "--dim", "32"]
    args = parser.parse_args(argv)
    apply_config_defaults(args, load_experiment_config(str(config)), parser,
                          argv=argv)
    assert args.dataset == "synthetic:pointmaze:n=4,T=20"
    assert args.horizon == 8
    assert args.batch_size == 16
    assert args.n_epochs == 3
    assert args.dim == 32  # explicit CLI flag beats config


def test_train_value_main(tmp_path):
    base = train_value_main([
        "--dataset", "synthetic:pointmaze:n=8,T=30",
        "--horizon", "8", "--dim", "8", "--dim-mults", "1", "2",
        "--n-timesteps", "10", "--n-epochs", "1", "--batch-size", "32",
        "--log-dir", str(tmp_path), "--device", "cpu",
    ])
    assert os.path.exists(base + ".orbax")
    from dadiff_tpu.cli import load_value_checkpoint

    vnet, params = load_value_checkpoint(base)
    import jax
    import jax.numpy as jnp

    v = vnet.apply({"params": params}, jnp.zeros((2, 8, 8)), jnp.zeros(2, jnp.int32))
    assert v.shape == (2,)


def test_evaluate_main_end_to_end(tmp_path):
    """Full CLI round trip on CPU: train -> evaluate (guided + dynamics-aware)
    on the real PointMaze env with tiny settings."""
    pytest.importorskip("gymnasium")
    from dadiff_tpu.cli import evaluate_main

    log_dir = train_main([
        "--dataset", "synthetic:pointmaze:n=8,T=30",
        "--horizon", "8", "--dim", "8", "--dim-mults", "1", "2",
        "--n-timesteps", "5", "--n-epochs", "1", "--batch-size", "32",
        "--log-dir", str(tmp_path), "--device", "cpu", "--save-freq", "0",
    ])
    pt = next(f for f in os.listdir(log_dir) if f.endswith(".pt"))
    ckpt = os.path.join(log_dir, pt)

    for policy_type in ("guided", "dynamics-aware"):
        metrics = evaluate_main([
            "--checkpoint", ckpt,
            "--env", "PointMaze_UMaze-v3",
            "--policy-type", policy_type,
            "--dataset", "synthetic:pointmaze:n=8,T=30",
            "--n-episodes", "1", "--max-steps", "5",
            "--sampling-timesteps", "5",
            "--device", "cpu",
            "--results-dir", str(tmp_path / "results"),
        ])
        assert "success_rate" in metrics
        assert len(metrics["episode_rewards"]) == 1
    files = os.listdir(tmp_path / "results")
    assert any(f.startswith("guided_") for f in files)
    assert any(f.startswith("dynamics-aware_") for f in files)


def test_load_model_native_orbax(tmp_path):
    """evaluate-path loading from the native orbax checkpoint (no .pt)."""
    from dadiff_tpu.cli import load_model

    log_dir = train_main([
        "--dataset", "synthetic:pointmaze:n=8,T=30",
        "--horizon", "8", "--dim", "8", "--dim-mults", "1", "2",
        "--n-timesteps", "10", "--n-epochs", "1", "--batch-size", "32",
        "--log-dir", str(tmp_path), "--device", "cpu", "--save-freq", "0",
        "--no-export-pt",
    ])
    files = os.listdir(log_dir)
    assert not any(f.endswith(".pt") for f in files)
    base = next(f for f in files if f.endswith(".orbax"))
    diffusion, params, dataset = load_model(
        os.path.join(log_dir, base), "synthetic:pointmaze:n=8,T=30"
    )
    assert diffusion.horizon == 8
    import jax

    traj = diffusion.p_sample_loop(params, jax.random.PRNGKey(0), (1, 8, 8))
    assert np.all(np.isfinite(np.asarray(traj)))

    # EMA branch
    _, ema_params, _ = load_model(
        os.path.join(log_dir, base), "synthetic:pointmaze:n=8,T=30", use_ema=True
    )
    assert len(jax.tree_util.tree_leaves(ema_params)) == len(
        jax.tree_util.tree_leaves(params)
    )


def test_module_dispatcher_routes_and_rejects():
    """`python -m dadiff_tpu.cli <cmd>` routes to the right main and fails
    loudly on unknown commands (it used to be a silent no-op)."""
    from dadiff_tpu.cli import main

    with pytest.raises(SystemExit, match="unknown command"):
        main(["frobnicate"])
    with pytest.raises(SystemExit, match="usage"):
        main([])
    # top-level --help prints usage and exits cleanly (no SystemExit)
    assert main(["--help"]) is None
    # A real command parses its own argv (argparse exits 0 on --help).
    with pytest.raises(SystemExit) as ei:
        main(["download", "--help"])
    assert ei.value.code == 0
