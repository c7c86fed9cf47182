"""Command-line entry points: train / evaluate / download.

Flag surfaces mirror the reference CLIs (train.py:22-102, evaluate.py:28-60,
download_data.py:10-21) with TPU-native additions: --config (YAML experiment
files that are actually consumed), --mesh-dp (data-parallel mesh), --dtype,
dataset specs beyond minari ('synthetic:…', 'gym:…', 'npz:…'), and a
--parity-mode switch on dynamics-aware eval.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Optional

import numpy as np


def _select_device(device: str) -> None:
    """--device {tpu,cpu}: JAX_PLATFORMS is pinned by some environments, so
    override via config after import. Also enables the persistent XLA
    compilation cache — first compiles of the fused train step can take
    minutes on remote-compile TPU setups; reruns then hit the cache."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()


def enable_compilation_cache(path: Optional[str] = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "DADIFF_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/dadiff_tpu/xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _mesh(n_dp: int):
    if n_dp <= 1:
        return None
    from dadiff_tpu.parallel.mesh import make_mesh

    return make_mesh({"dp": n_dp})


# ===========================================================================
# train
# ===========================================================================

def build_train_parser() -> argparse.ArgumentParser:
    # allow_abbrev off: abbreviated flags would dodge the explicit-CLI scan
    # in utils/config.apply_config_defaults and lose to config values
    p = argparse.ArgumentParser(
        description="Train/Fine-tune a diffusion planner", allow_abbrev=False
    )
    p.add_argument("--config", type=str, default=None,
                   help="YAML/JSON experiment config (CLI flags override)")
    # Dataset (reference train.py:26-31)
    p.add_argument("--dataset", type=str, default="synthetic:pointmaze",
                   help="dataset spec: minari name | synthetic:* | gym:* | npz:*")
    p.add_argument("--horizon", type=int, default=16)
    p.add_argument("--normalizer", type=str, default="LimitsNormalizer",
                   choices=["LimitsNormalizer", "GaussianNormalizer"])
    p.add_argument("--max-path-length", type=int, default=1000)
    # Model (reference train.py:33-42; --model-type is a framework addition:
    # the reference has only the conv U-Net)
    p.add_argument("--model-type", type=str, default="unet",
                   choices=["unet", "transformer"],
                   help="denoiser family: conv U-Net (reference parity) or "
                        "DiT-style temporal transformer")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--dim-mults", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--kernel-size", type=int, default=5)
    p.add_argument("--depth", type=int, default=4,
                   help="transformer blocks (model-type=transformer)")
    p.add_argument("--n-heads", type=int, default=4,
                   help="attention heads (model-type=transformer)")
    p.add_argument("--n-timesteps", type=int, default=200)
    p.add_argument("--beta-schedule", type=str, default="cosine",
                   choices=["linear", "cosine"])
    p.add_argument("--loss-type", type=str, default="l2", choices=["l1", "l2"])
    p.add_argument("--predict-epsilon", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="model predicts noise (default) vs x0 directly")
    p.add_argument("--prediction", type=str, default=None,
                   choices=["epsilon", "x0", "v"],
                   help="explicit parameterization; 'v' (Salimans & Ho) is "
                        "new capability vs the reference. Overrides "
                        "--predict-epsilon when given")
    p.add_argument("--clip-denoised", action=argparse.BooleanOptionalAction,
                   default=True)
    # Training (reference train.py:44-53)
    p.add_argument("--n-epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup-steps", type=int, default=2000)
    p.add_argument("--gradient-clip", type=float, default=4.0)
    # Fine-tuning (reference train.py:55-61)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--reset-optimizer", action="store_true")
    p.add_argument("--finetune-mode", action="store_true")
    # Loss composition (reference train.py:63-67). The reference also accepts
    # --value-guidance-weight but warns it is unimplemented (train.py:294-298);
    # here value-function training is a real, separate entry point
    # (dadiff-train-values), so the dead flag is not replicated.
    p.add_argument("--projection-weight", type=float, default=0.0)
    # Dynamics (reference train.py:70-75)
    p.add_argument("--env", type=str, default="PointMaze_UMaze-v3")
    p.add_argument("--dynamics-method", type=str, default="data-driven",
                   choices=["data-driven", "analytical", "numerical", "trajectory",
                            "none"])
    # EMA (reference train.py:77-81)
    p.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                   default=True, help="EMA shadow params (--no-use-ema off)")
    p.add_argument("--ema-decay", type=float, default=0.995)
    # Logging (reference train.py:83-91)
    p.add_argument("--log-dir", type=str, default="./logs")
    p.add_argument("--save-freq", type=int, default=10000)
    p.add_argument("--eval-freq", type=int, default=5000)
    p.add_argument("--run-name", type=str, default=None)
    # System (reference train.py:93-100 + TPU additions)
    p.add_argument("--device", type=str, default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--num-workers", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh-dp", type=int, default=1,
                   help="data-parallel mesh size (1 = single device)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation dtype for the U-Net")
    p.add_argument("--no-export-pt", action="store_true",
                   help="skip reference-schema .pt checkpoint export")
    p.add_argument("--resume", action="store_true",
                   help="auto-resume from the latest checkpoint in the log dir "
                        "(preemption recovery)")
    p.add_argument("--skip-nonfinite", action="store_true",
                   help="skip updates from batches with non-finite gradients")
    return p


def train_main(argv=None) -> str:
    parser = build_train_parser()
    args = parser.parse_args(argv)
    if args.config:
        from dadiff_tpu.utils.config import apply_config_defaults, load_experiment_config

        apply_config_defaults(args, load_experiment_config(args.config), parser,
                              argv=argv)

    _select_device(args.device)

    import jax
    import jax.numpy as jnp

    from dadiff_tpu.datasets.sequence import SequenceDataset, create_dataloader
    from dadiff_tpu.losses import build_loss
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.utils.arrays import set_seed
    from dadiff_tpu.utils.training import Trainer, count_parameters, save_config

    set_seed(args.seed)

    mode = "Fine-tuning" if args.checkpoint else "Training"
    print(f"=== {mode}: dataset={args.dataset} horizon={args.horizon} "
          f"device={jax.default_backend()} ===")

    # Log dir layout (reference train.py:357-366)
    safe_ds = args.dataset.replace("/", "_").replace(":", "_")
    log_dir = Path(args.log_dir) / safe_ds
    if args.run_name:
        log_dir = log_dir / args.run_name
    log_dir.mkdir(parents=True, exist_ok=True)
    save_config(vars(args), str(log_dir / "config.json"))

    # Checkpoint (for fine-tune/resume): infer architecture from weights
    # (reference train.py:116-171)
    checkpoint = None
    ckpt_params = None
    if args.checkpoint:
        from dadiff_tpu.io.torch_compat import (
            diffusion_state_to_flax,
            infer_model_config_from_checkpoint,
            load_pt_checkpoint,
        )

        checkpoint = load_pt_checkpoint(args.checkpoint)
        inferred = infer_model_config_from_checkpoint(checkpoint)
        args.dim = inferred["dim"]
        args.dim_mults = inferred["dim_mults"]
        args.n_timesteps = inferred["n_timesteps"]
        args.beta_schedule = inferred["beta_schedule"]
        args.horizon = inferred["horizon"]
        ckpt_params = diffusion_state_to_flax(checkpoint["model_state_dict"])
        ckpt_config = checkpoint.get("config", {})
        print(f"checkpoint config inferred: dim={args.dim} mults={args.dim_mults} "
              f"T={args.n_timesteps} horizon={args.horizon}")

    # Dataset (reference train.py:369-386)
    dataset = SequenceDataset(
        dataset_name=args.dataset,
        horizon=args.horizon,
        normalizer=args.normalizer,
        max_path_length=args.max_path_length,
    )
    loader = create_dataloader(
        dataset, batch_size=args.batch_size, shuffle=True,
        num_workers=args.num_workers, seed=args.seed,
    )
    print(f"dataset: {len(dataset)} windows, obs={dataset.observation_dim} "
          f"act={dataset.action_dim}")
    if ckpt_params is not None:
        # Fine-tuning: the pretrained weights expect the ORIGINAL dataset's
        # scaling; stats re-derived from a different fine-tune dataset would
        # silently shift it (the exact hazard the eval path guards against).
        _apply_stored_normalizer(dataset, ckpt_config)

    # Model (reference train.py:174-235; transformer family is new surface)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if getattr(args, "model_type", "unet") == "transformer":
        from dadiff_tpu.models.temporal_transformer import TemporalTransformer

        denoiser = TemporalTransformer(
            transition_dim=dataset.transition_dim,
            dim=args.dim,
            depth=args.depth,
            n_heads=args.n_heads,
            dtype=dtype,
        )
    else:
        denoiser = TemporalUnet(
            transition_dim=dataset.transition_dim,
            dim=args.dim,
            dim_mults=tuple(args.dim_mults),
            kernel_size=args.kernel_size,
            dtype=dtype,
        )
    diffusion = GaussianDiffusion(
        model=denoiser,
        horizon=args.horizon,
        observation_dim=dataset.observation_dim,
        action_dim=dataset.action_dim,
        n_timesteps=args.n_timesteps,
        beta_schedule=args.beta_schedule,
        loss_type=args.loss_type,
        predict_epsilon=args.predict_epsilon,
        clip_denoised=args.clip_denoised,
        prediction=args.prediction,
    )

    # Loss composition (reference train.py:237-311, sans its NameError bug)
    projection_matrix, state_dim = None, None
    if args.projection_weight > 0 and args.dynamics_method != "none":
        from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
        from dadiff_tpu.dynamics.registry import get_dynamics_for_env

        # hermetic sources can reuse the training episodes for sysID
        episodes = None
        if args.dataset.startswith(("synthetic:", "npz:", "gym:")):
            from dadiff_tpu.datasets.sources import load_episodes

            episodes = load_episodes(args.dataset)
        A, B, state_dim, act_dim = get_dynamics_for_env(
            env_name=args.env,
            dataset_name=None if episodes else args.dataset,
            method=args.dynamics_method.replace("-", "_"),
            episodes=episodes,
        )
        P = ProjectionMatrixBuilder(A, B, state_dim, act_dim).get_projection_matrix(
            args.horizon
        )
        projection_matrix = P
        print(f"projection loss enabled: state_dim={state_dim} P{P.shape}")

    loss_fn, loss_names = build_loss(
        diffusion,
        projection_weight=args.projection_weight,
        projection_matrix=projection_matrix,
        normalizer=dataset.normalizer,
        state_dim=state_dim,
    )

    # LR / fine-tune semantics (reference train.py:400-425)
    lr = args.lr
    if args.finetune_mode and not args.reset_optimizer:
        lr = args.lr * 0.1
        print(f"fine-tune mode: lr -> {lr}")

    # held-out probe batch for eval_freq validation (windows from the tail of
    # the index; an observability probe, not a strict episode-level split)
    val_batch = None
    if args.eval_freq and len(dataset) > 512:
        import numpy as _np

        val_batch = dataset.get_batch(_np.arange(len(dataset) - 256, len(dataset)))

    total_steps = args.n_epochs * len(loader)
    trainer = Trainer(
        diffusion,
        loader,
        loss_fn,
        params=ckpt_params,
        lr=lr,
        warmup_steps=args.warmup_steps if (args.reset_optimizer or not args.checkpoint)
        else 0,
        total_steps=total_steps,
        gradient_clip=args.gradient_clip,
        use_ema=args.use_ema,
        ema_decay=args.ema_decay,
        log_dir=str(log_dir),
        save_freq=args.save_freq,
        eval_freq=args.eval_freq,
        loss_names=loss_names,
        mesh=_mesh(args.mesh_dp),
        seed=args.seed,
        export_pt=not args.no_export_pt,
        skip_nonfinite=args.skip_nonfinite,
        val_batch=val_batch,
        normalizer=dataset.normalizer,
    )
    print(f"model parameters: {count_parameters(trainer.state.params):,}")

    start_epoch = 0
    if checkpoint is not None and not args.reset_optimizer:
        start_epoch = int(checkpoint.get("epoch", 0))
    if args.resume:
        resumed_epoch = trainer.load_latest()
        if resumed_epoch is not None:
            start_epoch = resumed_epoch
            print(f"auto-resumed at step {trainer.global_step} (epoch {start_epoch})")

    trainer.train(args.n_epochs, start_epoch=start_epoch)

    final_config = {
        **trainer._config_dict(),
        "projection_weight": args.projection_weight,
        "loss_components": loss_names,
        "normalizer": args.normalizer,
        "dataset": args.dataset,
    }
    with open(log_dir / "final_config.json", "w") as f:
        json.dump(final_config, f, indent=2)
    print(f"{mode} complete. Logs: {log_dir}")
    return str(log_dir)


# ===========================================================================
# value-function training (capability the reference declares but never
# implements: train.py:294-298 "Value guidance not yet implemented")
# ===========================================================================

def train_value_main(argv=None) -> str:
    p = argparse.ArgumentParser(description="Train a trajectory value function")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--normalizer", type=str, default="LimitsNormalizer")
    p.add_argument("--discount", type=float, default=0.99)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--dim-mults", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--n-timesteps", type=int, default=100,
                   help="diffusion schedule the value net is trained against")
    p.add_argument("--beta-schedule", type=str, default="cosine")
    p.add_argument("--n-epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--log-dir", type=str, default="./logs/values")
    p.add_argument("--device", type=str, default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--reward", type=str, default="recorded",
                   choices=["recorded", "goal-dense"],
                   help="value target reward: recorded env reward, or dense "
                        "negative goal distance synthesized from goal-concat "
                        "observations (sparse-reward tasks like PointMaze)")
    args = p.parse_args(argv)
    _select_device(args.device)

    import jax
    import jax.numpy as jnp
    import optax

    from dadiff_tpu.datasets.sequence import SequenceDataset, create_dataloader, \
        prefetch_to_device
    from dadiff_tpu.models.value_net import ValueNet, value_loss
    from dadiff_tpu.ops.schedules import make_schedule

    reward_fn = None
    if args.reward == "goal-dense":
        import numpy as np

        def reward_fn(ep):
            # goal-concat observation layout [x y vx vy gx gy] (maze envs):
            # dense shaping r_t = -||pos_{t+1} - goal|| gives the value net a
            # gradient everywhere, where the recorded reward is sparse/terminal
            obs = np.asarray(ep["observations"], dtype=np.float64)
            if obs.shape[-1] != 6:
                raise SystemExit(
                    "--reward goal-dense assumes the goal-concat maze "
                    "observation layout [x y vx vy gx gy] (6 dims); got "
                    f"{obs.shape[-1]} dims — use --reward recorded for "
                    "this dataset"
                )
            T = len(ep["actions"])
            nxt = obs[1:T + 1] if len(obs) > T else obs[:T]
            return -np.linalg.norm(nxt[:, 0:2] - nxt[:, 4:6], axis=-1)

    dataset = SequenceDataset(
        dataset_name=args.dataset, horizon=args.horizon,
        normalizer=args.normalizer, include_returns=True,
        discount=args.discount, reward_fn=reward_fn,
    )
    loader = create_dataloader(dataset, batch_size=args.batch_size, seed=args.seed)
    schedule = make_schedule(args.n_timesteps, args.beta_schedule)

    vnet = ValueNet(
        transition_dim=dataset.transition_dim, dim=args.dim,
        dim_mults=tuple(args.dim_mults),
    )
    rng = jax.random.PRNGKey(args.seed)
    params = vnet.init_params(rng, args.horizon)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(
            lambda pr: value_loss(vnet, pr, schedule, key, batch)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    os.makedirs(args.log_dir, exist_ok=True)
    for epoch in range(args.n_epochs):
        losses = []
        for batch in prefetch_to_device(iter(loader)):
            rng, key = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, batch, key)
            losses.append(loss)
        print(f"Epoch {epoch + 1}: value_loss={float(jnp.mean(jnp.stack(losses))):.4f}")

    from dadiff_tpu.io.checkpoints import save_native

    base = os.path.join(args.log_dir, "value_final")
    save_native(base, {"params": jax.device_get(params)}, config={
        "transition_dim": dataset.transition_dim,
        "dim": args.dim,
        "dim_mults": list(args.dim_mults),
        "horizon": args.horizon,
        "n_timesteps": args.n_timesteps,
        "beta_schedule": args.beta_schedule,
        "returns_mean": dataset.returns_mean,
        "returns_std": dataset.returns_std,
    })
    print(f"value checkpoint: {base}.orbax")
    return base


def load_value_checkpoint(base: str, expect_schedule=None):
    """Returns (value_net, params) from a train_value_main checkpoint.

    ``expect_schedule``: optional (n_timesteps, beta_schedule) of the
    planner this value net will guide; mismatched noise schedules would
    silently produce guidance gradients at noise levels the net never saw,
    so a mismatch raises.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dadiff_tpu.io.checkpoints import restore_native
    from dadiff_tpu.models.value_net import ValueNet

    # restore metadata first to build the template
    import json as _json

    with open(base + ".meta.json") as f:
        cfg = _json.load(f)["config"]
    vnet = ValueNet(
        transition_dim=cfg["transition_dim"], dim=cfg["dim"],
        dim_mults=tuple(cfg["dim_mults"]),
    )
    template = {"params": vnet.init_params(jax.random.PRNGKey(0), cfg["horizon"])}
    if expect_schedule is not None:
        want_t, want_beta = expect_schedule
        got_t = cfg.get("n_timesteps")
        got_beta = cfg.get("beta_schedule")
        if (got_t is not None and got_t != want_t) or (
            got_beta is not None and got_beta != want_beta
        ):
            raise SystemExit(
                f"value checkpoint was trained on schedule (T={got_t}, "
                f"{got_beta}) but the planner uses (T={want_t}, "
                f"{want_beta}); retrain the value net with matching "
                f"--n-timesteps/--beta-schedule"
            )
    state, _ = restore_native(base, template)
    return vnet, state["params"]


# ===========================================================================
# consistency distillation (few-step planning; models/consistency.py)
# ===========================================================================

def distill_main(argv=None) -> str:
    """Distill a trained DDPM planner into a consistency model: plans in
    1-4 model calls instead of the full chain (no reference counterpart —
    the reference has no fast sampling at all; its chain truncation indexes
    out of bounds, evaluate.py:352)."""
    p = argparse.ArgumentParser(
        description="Consistency-distill a trained diffusion planner"
    )
    p.add_argument("--checkpoint", type=str, required=True,
                   help="teacher checkpoint (.pt or orbax base)")
    p.add_argument("--dataset", type=str, required=True,
                   help="training dataset spec (same data the teacher saw)")
    p.add_argument("--n-epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=200)
    p.add_argument("--gradient-clip", type=float, default=1.0)
    p.add_argument("--target-ema-decay", type=float, default=0.95,
                   help="decay of the CD target network theta^- (the "
                        "TrainState EMA slot)")
    p.add_argument("--sigma-data", type=float, default=0.5)
    p.add_argument("--huber-c", type=float, default=None,
                   help="pseudo-Huber c (default: iCT's 0.00054*sqrt(H*D))")
    p.add_argument("--skip-steps", type=int, default=1,
                   help="teacher DDIM gap k per consistency pair (t, t-k) — "
                        "LCM's skipping-step; larger k = stronger signal per "
                        "pair, coarser ODE discretization")
    p.add_argument("--teacher-ema", action="store_true",
                   help="distill from the teacher's EMA weights")
    p.add_argument("--log-dir", type=str, default="./logs")
    p.add_argument("--run-name", type=str, default=None)
    p.add_argument("--save-freq", type=int, default=10000)
    p.add_argument("--num-workers", type=int, default=0)
    p.add_argument("--device", type=str, default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", action="store_true",
                   help="auto-resume the student from the run dir's latest "
                        "checkpoint (same semantics as train --resume: runs "
                        "--n-epochs MORE epochs)")
    p.add_argument("--method", type=str, default="consistency",
                   choices=["consistency", "progressive"],
                   help="consistency = 1-4-call CM student "
                        "(models/consistency.py); progressive = "
                        "Salimans-Ho step-halving rounds "
                        "(models/progressive.py) — the student stays a "
                        "standard eps-model evaluated with --sampler ddim "
                        "--sampling-timesteps <target-steps>")
    p.add_argument("--target-steps", type=int, default=6,
                   help="progressive: final model-call budget (halving "
                        "rounds T/2 -> ... -> target; --n-epochs applies "
                        "PER ROUND)")
    args = p.parse_args(argv)

    _select_device(args.device)

    import jax
    import jax.numpy as jnp

    from dadiff_tpu.datasets.sequence import create_dataloader
    from dadiff_tpu.models.consistency import make_cd_loss
    from dadiff_tpu.utils.arrays import set_seed
    from dadiff_tpu.utils.training import Trainer, count_parameters, save_config

    set_seed(args.seed)

    diffusion, teacher_params, dataset = load_model(
        args.checkpoint, args.dataset, use_ema=args.teacher_ema
    )
    if getattr(dataset, "checkpoint_config", {}).get("consistency"):
        # Mirrors the eval-side guard: teacher_ddim_step through a
        # consistency network would silently train on garbage targets.
        raise SystemExit(
            "checkpoint is already a consistency-distilled student "
            "(config consistency=true); distill from the DDPM teacher "
            "checkpoint instead"
        )
    print(f"teacher: horizon={diffusion.horizon} T={diffusion.n_timesteps} "
          f"params={count_parameters(teacher_params):,} "
          f"device={jax.default_backend()}")

    loader = create_dataloader(
        dataset, batch_size=args.batch_size, shuffle=True,
        num_workers=args.num_workers, seed=args.seed,
    )

    safe_ds = args.dataset.replace("/", "_").replace(":", "_")
    log_dir = Path(args.log_dir) / safe_ds
    log_dir = log_dir / (args.run_name or args.method)
    log_dir.mkdir(parents=True, exist_ok=True)
    save_config(vars(args), str(log_dir / "config.json"))

    if args.method == "progressive":
        from dadiff_tpu.models.progressive import (
            make_pd_loss,
            pd_round_schedule,
        )

        rounds = pd_round_schedule(diffusion.n_timesteps, args.target_steps)
        print(f"progressive rounds (steps): {rounds}")
        current_teacher = teacher_params
        for r, steps in enumerate(rounds):
            round_dir = log_dir / f"round_{r}_steps{steps}"
            round_dir.mkdir(parents=True, exist_ok=True)
            loss_fn = make_pd_loss(diffusion, current_teacher, steps)
            student_params = jax.tree_util.tree_map(jnp.copy, current_teacher)
            trainer = Trainer(
                diffusion,
                loader,
                loss_fn,
                params=student_params,
                lr=args.lr,
                warmup_steps=args.warmup_steps,
                total_steps=args.n_epochs * len(loader),
                gradient_clip=args.gradient_clip,
                use_ema=False,
                log_dir=str(round_dir),
                save_freq=args.save_freq,
                eval_freq=0,
                loss_names=["progressive"],
                seed=args.seed + r,
                normalizer=dataset.normalizer,
                extra_config={
                    "progressive": True,
                    "progressive_steps": int(steps),
                    "teacher_checkpoint": args.checkpoint,
                },
            )
            print(f"[pd round {r}] distilling to {steps} steps "
                  f"({args.n_epochs} epochs)...")
            trainer.train(args.n_epochs)
            current_teacher = trainer.state.params
        print(f"Progressive distillation complete ({rounds[-1]}-step "
              f"student). Evaluate with --sampler ddim "
              f"--sampling-timesteps {rounds[-1]}. Logs: {log_dir}")
        return str(log_dir)

    loss_fn = make_cd_loss(
        diffusion, teacher_params,
        sigma_data=args.sigma_data, huber_c=args.huber_c,
        skip_steps=args.skip_steps,
    )
    # student initializes FROM the teacher (consistency.py docstring); the
    # EMA slot starts as a copy and becomes the slow target theta^-.
    student_params = jax.tree_util.tree_map(jnp.copy, teacher_params)

    trainer = Trainer(
        diffusion,
        loader,
        loss_fn,
        params=student_params,
        lr=args.lr,
        warmup_steps=args.warmup_steps,
        total_steps=args.n_epochs * len(loader),
        gradient_clip=args.gradient_clip,
        use_ema=True,
        ema_decay=args.target_ema_decay,
        log_dir=str(log_dir),
        save_freq=args.save_freq,
        eval_freq=0,
        loss_names=["consistency"],
        seed=args.seed,
        normalizer=dataset.normalizer,
        loss_takes_ema=True,
        extra_config={
            "consistency": True,
            "sigma_data": args.sigma_data,
            "teacher_checkpoint": args.checkpoint,
            "skip_steps": args.skip_steps,
        },
    )
    start_epoch = 0
    if args.resume:
        resumed_epoch = trainer.load_latest()
        if resumed_epoch is not None:
            start_epoch = resumed_epoch
            print(f"auto-resumed at step {trainer.global_step} "
                  f"(epoch {start_epoch})")
    trainer.train(args.n_epochs, start_epoch=start_epoch)
    print(f"Distillation complete. Logs: {log_dir}")
    return str(log_dir)


# ===========================================================================
# evaluate
# ===========================================================================

def build_eval_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Evaluate a diffusion planner", allow_abbrev=False
    )
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--env", type=str, default="PointMaze_UMaze-v3")
    p.add_argument("--n-episodes", type=int, default=10)
    p.add_argument("--policy-type", type=str, default="mpc",
                   choices=["guided", "mpc", "dynamics-aware", "value-guided"])
    p.add_argument("--action-horizon", type=int, default=16)
    p.add_argument("--value-checkpoint", type=str, default=None,
                   help="value-function checkpoint base path (for value-guided)")
    p.add_argument("--guide-weight", type=float, default=1.0)
    p.add_argument("--device", type=str, default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--render", type=str, default="none",
                   choices=["none", "human", "video"])
    p.add_argument("--video-dir", type=str, default="./videos")
    p.add_argument("--results-dir", type=str, default="./results")
    p.add_argument("--dataset", type=str, default=None,
                   help="dataset spec for the normalizer (defaults by env)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--sampling-timesteps", type=int, default=None,
                   help="reverse-chain step budget (default: 200, or 4 "
                        "model calls for --sampler consistency)")
    p.add_argument("--projection-schedule", type=str, default="noise_schedule",
                   choices=["constant", "linear", "quadratic", "noise_schedule"])
    p.add_argument("--projection-strength", type=float, default=1.0)
    p.add_argument("--parity-mode", action="store_true",
                   help="reproduce the reference's as-implemented sampling "
                        "(projection NOT applied during denoising)")
    p.add_argument("--wall-aware", action="store_true",
                   help="obstacle-aware projection: revert plan rows the "
                        "projection drags into maze wall cells (PointMaze "
                        "envs only)")
    p.add_argument("--wall-margin", type=float, default=None,
                   help="wall-collision probe margin for --wall-aware "
                        "(default: the env's agent radius; 0 = center-cell "
                        "only)")
    p.add_argument("--action-source", type=str, default="plan",
                   choices=["plan", "inverse-dynamics", "track"],
                   help="execute the plan's action columns; derive actions "
                        "from consecutive planned states via a learned "
                        "inverse-dynamics model (Decision-Diffuser-style, "
                        "open-loop); or 'track': closed-loop tracking — each "
                        "action computed at execution time from the OBSERVED "
                        "state toward the planned next state, "
                        "u_t = g(s_obs, s_plan_next), correcting "
                        "within-chunk drift without a replan")
    p.add_argument("--candidate-scorer", type=str, default="goal",
                   choices=["goal", "velocity", "wall-penalty"],
                   help="best-of-N plan scorer: final goal distance (maze), "
                        "negative mean planned forward velocity "
                        "(locomotion), or goal distance + wall-collision "
                        "penalty (wall-dense mazes: plain goal distance "
                        "prefers plans that cut through walls)")
    p.add_argument("--wall-penalty-weight", type=float, default=5.0,
                   help="penalty per fully-in-wall plan (scaled by the "
                        "fraction of rows in wall cells) for "
                        "--candidate-scorer wall-penalty")
    p.add_argument("--skip-conditioned-action", action="store_true",
                   help="start the action buffer at t=1 instead of t=0: the "
                        "reference buffers from t=0, whose action the "
                        "conditioning zeroed, so every replan's first action "
                        "unnormalizes to the dataset mean (a parity quirk "
                        "that costs reward on locomotion)")
    p.add_argument("--use-ema", action="store_true",
                   help="evaluate the EMA weights if present")
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--sampler", type=str, default="ddpm",
                   choices=["ddpm", "ddim", "dpmpp", "consistency"],
                   help="ddim/dpmpp = strided fast sampling (with conditioning/"
                        "guidance/projection composed); consistency = few-step "
                        "multistep sampling with a distilled student checkpoint "
                        "(scripts/distill.py) — --sampling-timesteps is the "
                        "model-call budget (default 4)")
    p.add_argument("--n-candidates", type=int, default=1,
                   help="best-of-N candidate plans per replan (batched, "
                        "near-free on TPU; scored by final goal distance)")
    p.add_argument("--warm-start-t", type=int, default=None,
                   help="receding-horizon warm start: replans re-noise the "
                        "previous plan (shifted by the executed steps) to "
                        "this timestep and denoise only t<K — ~T/K fewer "
                        "model calls per replan after the first")
    p.add_argument("--warm-start-auto", action="store_true",
                   help="adaptive warm-start depth: pick each replan's "
                        "re-noise depth from the measured drift between the "
                        "executed observation and the previous plan (full "
                        "chain when the drift is too large to re-noise "
                        "over) — no per-task K tuning")
    p.add_argument("--megakernel", action="store_true",
                   help="run each replan wave (all candidates, "
                        "conditioning, per-step projection, best-of-N "
                        "selection) through ONE pallas_call "
                        "(ops/pallas_planner.py) instead of the XLA scan "
                        "sampler (ddpm only)")
    p.add_argument("--mega-group-chains", type=int, default=64,
                   help="chains row-stacked per megakernel grid group")
    p.add_argument("--replan-deviation", type=float, default=None,
                   help="replan early when the executed observation drifts "
                        "more than this L2 distance (normalized space) from "
                        "the plan row it should be on (sequential protocol "
                        "only — lockstep --batched waves cannot replan "
                        "per-env)")
    p.add_argument("--batched", action="store_true",
                   help="run all episodes in lockstep with batched replans "
                        "(~Nx faster; per-env seeding, not the sequential "
                        "reference protocol)")
    p.add_argument("--save-episodes", type=str, default=None,
                   help="save the executed episodes as an npz dataset "
                        "(requires --batched) — the self-improvement loop: "
                        "merge the policy's own rollouts into the training "
                        "set and fine-tune")
    return p


def maze_grid_for_env(env_name: str):
    """Occupancy grid for a PointMaze env name (None if not a known maze)."""
    from dadiff_tpu.envs.pointmaze_jax import MAZE_MAPS

    name = env_name.lower()
    for key in ("umaze", "medium", "large", "open"):
        if key in name:
            return MAZE_MAPS[key]
    return None


def _apply_stored_normalizer(dataset, config: dict) -> None:
    """Prefer normalization stats persisted at train time over stats derived
    from whatever --dataset is given at eval — a different or regenerated
    dataset would otherwise silently shift obs/action scaling."""
    stats = (config or {}).get("normalizer_stats")
    if not stats:
        return
    from dadiff_tpu.datasets.normalization import DatasetNormalizer

    arrays = {k: np.asarray(v, np.float32) for k, v in stats.items()}
    stored = DatasetNormalizer.from_arrays(
        arrays, normalizer_name=config.get("normalizer_name", "stored")
    )
    if stored.observation_dim != dataset.observation_dim or \
            stored.action_dim != dataset.action_dim:
        print("WARNING: checkpoint normalizer stats dims do not match the "
              "eval dataset; falling back to dataset-derived stats")
        return
    dataset.set_normalizer(stored)
    print("using checkpoint-stored normalization stats")


# env -> default dataset spec (reference evaluate.py:333-337 + hermetic paths)
ENV_TO_DATASET = {
    "HalfCheetah-v5": "mujoco/halfcheetah/simple-v0",
    "Hopper-v5": "mujoco/hopper/simple-v0",
    "Walker2d-v5": "mujoco/walker2d/simple-v0",
    "PointMaze_UMaze-v3": "D4RL/pointmaze/umaze-v2",
    "PointMaze_Medium-v3": "D4RL/pointmaze/medium-v2",
    "PointMaze_Large-v3": "D4RL/pointmaze/large-v2",
}


def load_model(checkpoint_path: str, dataset_spec: str, horizon_hint=None,
               use_ema: bool = False):
    """Load a checkpoint + dataset normalizer and rebuild the model
    (reference evaluate.py:125-203). Returns (diffusion, params, dataset).

    Accepts either format: the reference-schema torch ``.pt`` (architecture
    inferred from weight shapes) or the native orbax checkpoint (base path or
    ``*.orbax`` dir; config from the ``.meta.json`` sidecar).
    """
    from dadiff_tpu.datasets.sequence import SequenceDataset
    from dadiff_tpu.io.torch_compat import (
        diffusion_state_to_flax,
        infer_model_config_from_checkpoint,
        load_pt_checkpoint,
    )
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    base = checkpoint_path[:-len(".orbax")] if checkpoint_path.endswith(".orbax") \
        else checkpoint_path
    if os.path.isdir(base + ".orbax"):
        return _load_model_native(base, dataset_spec, horizon_hint, use_ema)

    checkpoint = load_pt_checkpoint(checkpoint_path)
    cfg = infer_model_config_from_checkpoint(checkpoint)
    # Booleans are not inferable from weight shapes; take them from the
    # stored config sidecar when present.
    for key in ("predict_epsilon", "clip_denoised", "prediction"):
        if key in checkpoint.get("config", {}):
            cfg[key] = checkpoint["config"][key]
    horizon = horizon_hint or cfg["horizon"]

    dataset = SequenceDataset(
        dataset_name=dataset_spec,
        horizon=horizon,
        normalizer="LimitsNormalizer",
        max_path_length=1000,
        use_padding=True,
    )
    _apply_stored_normalizer(dataset, checkpoint.get("config", {}))
    # expose checkpoint provenance (e.g. the consistency-distillation marker)
    dataset.checkpoint_config = dict(checkpoint.get("config", {}) or {})
    unet = TemporalUnet(
        transition_dim=dataset.transition_dim,
        dim=cfg["dim"],
        dim_mults=tuple(cfg["dim_mults"]),
    )
    diffusion = GaussianDiffusion(
        model=unet,
        horizon=horizon,
        observation_dim=dataset.observation_dim,
        action_dim=dataset.action_dim,
        n_timesteps=cfg["n_timesteps"],
        beta_schedule=cfg["beta_schedule"],
        predict_epsilon=bool(cfg.get("predict_epsilon", True)),
        clip_denoised=bool(cfg.get("clip_denoised", True)),
        prediction=cfg.get("prediction"),
    )
    state_key = "ema_state_dict" if (use_ema and checkpoint.get("ema_state_dict")) \
        else "model_state_dict"
    params = diffusion_state_to_flax(checkpoint[state_key])
    # Commit params to device ONCE. Host-numpy params would be re-uploaded on
    # every jit call — on a tunneled TPU that is seconds per replan.
    import jax

    params = jax.device_put(params)
    return diffusion, params, dataset


def _load_model_native(base: str, dataset_spec: str, horizon_hint=None,
                       use_ema: bool = False):
    """Native-orbax branch of :func:`load_model` (Trainer save_native layout:
    full TrainState + config sidecar)."""
    import jax

    from dadiff_tpu.datasets.sequence import SequenceDataset
    from dadiff_tpu.io.checkpoints import restore_native
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet
    from dadiff_tpu.utils.training import TrainState, make_optimizer

    with open(base + ".meta.json") as f:
        cfg = json.load(f)["config"]
    horizon = horizon_hint or cfg["horizon"]

    dataset = SequenceDataset(
        dataset_name=dataset_spec,
        horizon=horizon,
        normalizer="LimitsNormalizer",
        max_path_length=1000,
        use_padding=True,
    )
    _apply_stored_normalizer(dataset, cfg)
    if cfg.get("model_type") == "transformer":
        from dadiff_tpu.models.temporal_transformer import TemporalTransformer

        denoiser = TemporalTransformer(
            transition_dim=dataset.transition_dim,
            dim=cfg["dim"],
            depth=int(cfg.get("depth", 4)),
            n_heads=int(cfg.get("n_heads", 4)),
            mlp_ratio=int(cfg.get("mlp_ratio", 4)),
        )
    else:
        denoiser = TemporalUnet(
            transition_dim=dataset.transition_dim,
            dim=cfg["dim"],
            dim_mults=tuple(cfg["dim_mults"]),
        )
    diffusion = GaussianDiffusion(
        model=denoiser,
        horizon=horizon,
        observation_dim=dataset.observation_dim,
        action_dim=dataset.action_dim,
        n_timesteps=cfg["n_timesteps"],
        beta_schedule=cfg["beta_schedule"],
        predict_epsilon=bool(cfg.get("predict_epsilon", True)),
        clip_denoised=bool(cfg.get("clip_denoised", True)),
        prediction=cfg.get("prediction"),
    )
    import jax.numpy as jnp

    params0 = diffusion.init_params(jax.random.PRNGKey(0))
    # schedule-carrying optimizer to match the Trainer's opt_state structure
    from dadiff_tpu.utils.training import warmup_cosine_schedule

    optimizer = make_optimizer(warmup_cosine_schedule(1e-3, 0, 1))
    template = TrainState(
        step=jnp.asarray(0), params=params0, opt_state=optimizer.init(params0),
        ema_params=jax.tree_util.tree_map(jnp.copy, params0),
    )
    state, _ = restore_native(base, template)
    params = state.ema_params if (use_ema and state.ema_params is not None) \
        else state.params
    dataset.checkpoint_config = dict(cfg or {})
    return diffusion, jax.device_put(params), dataset


def build_policy_from_args(args, diffusion, params, dataset, dataset_spec,
                           sampling_timesteps):
    """Construct the policy an eval-parser namespace describes — shared by
    evaluate_main and the planning server (scripts/serve.py)."""
    from dadiff_tpu.guides.policies import (
        DynamicsAwarePolicy,
        GuidedPolicy,
        MPCPolicy,
    )

    candidate_scorer = None
    if args.candidate_scorer == "velocity":
        from dadiff_tpu.guides.policies import velocity_scorer_for_env

        candidate_scorer = velocity_scorer_for_env(args.env)
    elif args.candidate_scorer == "wall-penalty":
        from dadiff_tpu.guides.policies import make_wall_penalty_scorer

        grid = maze_grid_for_env(args.env)
        if grid is None:
            raise SystemExit(
                f"--candidate-scorer wall-penalty: no maze map for {args.env}"
            )
        candidate_scorer = make_wall_penalty_scorer(
            dataset.normalizer.obs_mean, dataset.normalizer.obs_std,
            grid, penalty=args.wall_penalty_weight,
        )

    inverse_dynamics = None
    track_planned_states = args.action_source == "track"
    if args.action_source in ("inverse-dynamics", "track"):
        from dadiff_tpu.datasets.sources import load_episodes
        from dadiff_tpu.envs.learned_model import train_inverse_dynamics

        print("fitting inverse-dynamics model on the dataset ...")
        inverse_dynamics, inv_metrics = train_inverse_dynamics(
            load_episodes(dataset_spec), seed=args.seed
        )
        print(f"inverse-dynamics held-out action R^2: "
              f"mean={inv_metrics['r2_mean']:.4f} "
              f"min={inv_metrics['r2_min']:.4f}")

    if args.policy_type == "guided":
        policy = GuidedPolicy(
            diffusion, dataset.normalizer, params=params,
            sampling_timesteps=sampling_timesteps, seed=args.seed,
            n_candidates=args.n_candidates, sampler=args.sampler,
            skip_conditioned_action=args.skip_conditioned_action,
            candidate_scorer=candidate_scorer,
            inverse_dynamics=inverse_dynamics,
            track_planned_states=track_planned_states,
            warm_start_t=args.warm_start_t,
            warm_start_auto=args.warm_start_auto,
            replan_deviation=args.replan_deviation,
        )
    elif args.policy_type == "mpc":
        policy = MPCPolicy(
            diffusion, dataset.normalizer, params=params,
            action_horizon=args.action_horizon,
            sampling_timesteps=sampling_timesteps, seed=args.seed,
            n_candidates=args.n_candidates, sampler=args.sampler,
            skip_conditioned_action=args.skip_conditioned_action,
            candidate_scorer=candidate_scorer,
            inverse_dynamics=inverse_dynamics,
            track_planned_states=track_planned_states,
            warm_start_t=args.warm_start_t,
            warm_start_auto=args.warm_start_auto,
            replan_deviation=args.replan_deviation,
        )
    elif args.policy_type == "value-guided":
        from dadiff_tpu.guides.policies import ValueGuidedPolicy
        from dadiff_tpu.models.value_net import make_value_guide_fn

        if not args.value_checkpoint:
            raise SystemExit("value-guided requires --value-checkpoint")
        vnet, vparams = load_value_checkpoint(
            args.value_checkpoint,
            expect_schedule=(diffusion.n_timesteps, diffusion.beta_schedule),
        )
        policy = ValueGuidedPolicy(
            diffusion, dataset.normalizer,
            trajectory_value_fn=make_value_guide_fn(vnet, vparams),
            params=params,
            guide_weight=args.guide_weight,
            action_horizon=args.action_horizon,
            sampling_timesteps=sampling_timesteps, seed=args.seed,
            skip_conditioned_action=args.skip_conditioned_action,
            candidate_scorer=candidate_scorer,
            inverse_dynamics=inverse_dynamics,
            track_planned_states=track_planned_states,
            warm_start_t=args.warm_start_t,
            warm_start_auto=args.warm_start_auto,
            replan_deviation=args.replan_deviation,
        )
    else:  # dynamics-aware (reference evaluate.py:362-404)
        from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
        from dadiff_tpu.dynamics.registry import get_dynamics_for_env

        episodes = None
        if dataset_spec.startswith(("synthetic:", "npz:", "gym:")):
            from dadiff_tpu.datasets.sources import load_episodes

            episodes = load_episodes(dataset_spec)
        A, B, state_dim, action_dim = get_dynamics_for_env(
            env_name=args.env,
            dataset_name=None if episodes else dataset_spec,
            method="data_driven",
            episodes=episodes,
        )
        P = ProjectionMatrixBuilder(A, B, state_dim, action_dim).get_projection_matrix(
            diffusion.horizon
        )
        wall_grid = None
        if args.wall_aware:
            wall_grid = maze_grid_for_env(args.env)
            if wall_grid is None:
                raise SystemExit(f"--wall-aware: no maze map for {args.env}")
        # optional value guidance stacked on top of projection (composite:
        # guidance biases the posterior mean, projection keeps it dynamically
        # feasible, best-of-N selects)
        guide_fn, guide_weight = None, 0.0
        if args.value_checkpoint:
            from dadiff_tpu.models.value_net import make_value_guide_fn

            vnet, vparams = load_value_checkpoint(
                args.value_checkpoint,
                expect_schedule=(
                    diffusion.n_timesteps, diffusion.beta_schedule
                ),
            )
            guide_fn = make_value_guide_fn(vnet, vparams)
            guide_weight = args.guide_weight
        policy = DynamicsAwarePolicy(
            diffusion,
            projection_matrix=P,
            normalizer=dataset.normalizer,
            params=params,
            state_dim=state_dim,
            projection_schedule=args.projection_schedule,
            projection_strength=args.projection_strength,
            action_horizon=args.action_horizon,
            sampling_timesteps=sampling_timesteps,
            parity_mode=args.parity_mode,
            wall_grid=wall_grid,
            wall_margin=args.wall_margin,
            seed=args.seed,
            n_candidates=args.n_candidates,
            sampler=args.sampler,
            skip_conditioned_action=args.skip_conditioned_action,
            candidate_scorer=candidate_scorer,
            inverse_dynamics=inverse_dynamics,
            track_planned_states=track_planned_states,
            warm_start_t=args.warm_start_t,
            warm_start_auto=args.warm_start_auto,
            replan_deviation=args.replan_deviation,
            guide_fn=guide_fn,
            guide_weight=guide_weight,
        )
    if getattr(args, "megakernel", False):
        from dadiff_tpu.ops.pallas_planner import wire_policy_megakernel

        wire_policy_megakernel(
            policy, n_candidates=args.n_candidates,
            group_chains=getattr(args, "mega_group_chains", 64),
        )
        print(f"megakernel planning path: bo{args.n_candidates} per replan "
              f"wave through one pallas_call")
    return policy


def evaluate_main(argv=None) -> dict:
    parser = build_eval_parser()
    args = parser.parse_args(argv)
    if args.replan_deviation is not None and args.batched:
        raise SystemExit(
            "--replan-deviation needs the sequential protocol (drop --batched):"
            " lockstep waves cannot replan per-env"
        )
    _select_device(args.device)

    from dadiff_tpu.envs.host import evaluate_policy, make_env, save_results

    dataset_spec = args.dataset or ENV_TO_DATASET.get(args.env)
    if dataset_spec is None:
        raise SystemExit(f"No default dataset for {args.env}; pass --dataset")

    print(f"=== Evaluating {args.policy_type} on {args.env} "
          f"(checkpoint {args.checkpoint}) ===")
    diffusion, params, dataset = load_model(
        args.checkpoint, dataset_spec, use_ema=args.use_ema
    )

    # Consistency-distilled checkpoints only make sense under the consistency
    # sampler (and vice versa the student is NOT a DDPM denoiser anymore).
    is_cm = bool(getattr(dataset, "checkpoint_config", {}).get("consistency"))
    if is_cm and args.sampler != "consistency":
        raise SystemExit(
            "checkpoint is a consistency-distilled student (config "
            "consistency=true); evaluate it with --sampler consistency"
        )
    if args.sampler == "consistency" and not is_cm:
        print("WARNING: --sampler consistency with a checkpoint not marked "
              "as distilled — expect garbage unless this really is a "
              "consistency model")

    # Default depends on the sampler: DDPM-chain scale vs model-call budget.
    if args.sampling_timesteps is None:
        args.sampling_timesteps = 4 if args.sampler == "consistency" else 200
    elif args.sampler == "consistency" and args.sampling_timesteps > 16:
        raise SystemExit(
            f"--sampler consistency interprets --sampling-timesteps as the "
            f"model-call budget (<= 16); got {args.sampling_timesteps}. "
            f"Omit the flag for the default budget of 4."
        )
    # Safe truncation (vs reference's raw overwrite, evaluate.py:350-353)
    sampling_timesteps = min(args.sampling_timesteps, diffusion.n_timesteps)
    if sampling_timesteps != args.sampling_timesteps:
        print(f"clamping sampling timesteps {args.sampling_timesteps} -> "
              f"{sampling_timesteps} (trained {diffusion.n_timesteps})")

    policy = build_policy_from_args(
        args, diffusion, params, dataset, dataset_spec, sampling_timesteps
    )

    if args.save_episodes and not args.batched:
        raise SystemExit("--save-episodes requires --batched")
    if args.batched:
        from dadiff_tpu.envs.vector_eval import evaluate_policy_batched

        metrics = evaluate_policy_batched(
            policy, args.env, n_episodes=args.n_episodes,
            max_steps=args.max_steps, seed=args.seed,
            record_episodes=bool(args.save_episodes),
        )
        recorded = metrics.pop("recorded_episodes", None)
        if args.save_episodes and recorded is not None:
            from dadiff_tpu.datasets.sources import save_episodes_npz

            save_episodes_npz(args.save_episodes, recorded)
            print(f"saved {len(recorded)} executed episodes -> "
                  f"{args.save_episodes}")
        env = None  # the batched evaluator manages its own envs
    else:
        env = make_env(args.env, render=args.render, video_dir=args.video_dir)
        env.reset(seed=args.seed)
        metrics = evaluate_policy(
            policy, env, n_episodes=args.n_episodes, max_steps=args.max_steps
        )
    path = save_results(
        metrics,
        policy_type=args.policy_type,
        env_name=args.env,
        results_dir=args.results_dir,
        checkpoint=args.checkpoint,
        dataset=dataset_spec,
        n_episodes=args.n_episodes,
        sampling_timesteps=sampling_timesteps,
        seed=args.seed,
        extra={
            # full eval-configuration provenance (which knobs produced this)
            "sampler": args.sampler,
            "n_candidates": args.n_candidates,
            "candidate_scorer": args.candidate_scorer,
            "wall_penalty_weight": args.wall_penalty_weight
            if args.candidate_scorer == "wall-penalty" else None,
            "action_source": args.action_source,
            "batched": args.batched,
            "wall_aware": getattr(args, "wall_aware", False),
            "wall_margin": getattr(args, "wall_margin", None),
            "parity_mode": args.parity_mode,
            "projection_schedule": args.projection_schedule,
            "projection_strength": args.projection_strength,
            "action_horizon": args.action_horizon,
            "warm_start_t": args.warm_start_t,
            "replan_deviation": args.replan_deviation,
            "guide_weight": args.guide_weight
            if (args.policy_type == "value-guided" or args.value_checkpoint)
            else None,
            "value_checkpoint": args.value_checkpoint,
            "use_ema": args.use_ema,
        },
    )
    print(f"Mean reward: {metrics['mean_reward']:.2f} ± {metrics['std_reward']:.2f}")
    print(f"Mean length: {metrics['mean_length']:.2f} "
          f"success rate: {metrics['success_rate']:.2f}")
    print(f"Results: {path}")
    if env is not None:
        env.close()
    return metrics


# ===========================================================================
# download / dataset management
# ===========================================================================

def download_main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Dataset management")
    p.add_argument("--list", action="store_true", help="list remote minari datasets")
    p.add_argument("--info", type=str, default=None, help="show dataset info")
    p.add_argument("--dataset", type=str, default=None, help="download one dataset")
    p.add_argument("--collect", type=str, default=None,
                   help="collect episodes from a source spec "
                        "(synthetic:*/gym:*) into --out")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--out", type=str, default=None, help=".npz output path")
    args = p.parse_args(argv)

    if args.collect:
        from dadiff_tpu.datasets.sources import load_episodes, save_episodes_npz

        episodes = load_episodes(args.collect, n_episodes=args.episodes)
        out = args.out or "episodes.npz"
        save_episodes_npz(out, episodes)
        print(f"saved {len(episodes)} episodes -> {out}")
        return

    if args.info and args.info.startswith(
        ("synthetic:", "gym:", "npz:", "expert:", "mppi:")
    ):
        from dadiff_tpu.datasets.sources import load_episodes

        episodes = load_episodes(args.info, n_episodes=args.episodes)
        total_steps = sum(len(ep["actions"]) for ep in episodes)
        print(f"Dataset: {args.info}")
        print(f"  Total episodes: {len(episodes)}")
        print(f"  Total steps: {total_steps}")
        ep = episodes[0]
        print(f"  observations: {np.asarray(ep['observations']).shape}")
        print(f"  actions: {np.asarray(ep['actions']).shape}")
        print(f"  rewards: {np.asarray(ep['rewards']).shape}")
        return

    try:
        import minari
    except ImportError:
        raise SystemExit(
            "minari is not installed; use --collect synthetic:pointmaze or "
            "--collect gym:<EnvName> for hermetic data"
        )

    if args.list:
        remote = minari.list_remote_datasets()
        for name in sorted(remote):
            print(name)
    elif args.info:
        # Reference parity: print totals + sample-episode shapes
        # (reference scripts/download_data.py:50-87).
        ds = minari.load_dataset(args.info, download=True)
        print(f"Dataset: {args.info}")
        print(f"  Total episodes: {ds.total_episodes}")
        print(f"  Total steps: {ds.total_steps}")
        ep = next(iter(ds.iterate_episodes()))
        obs = ep.observations
        if isinstance(obs, dict):
            for k, v in obs.items():
                print(f"  observations[{k}]: {np.asarray(v).shape}")
        else:
            print(f"  observations: {np.asarray(obs).shape}")
        print(f"  actions: {np.asarray(ep.actions).shape}")
        print(f"  rewards: {np.asarray(ep.rewards).shape}")
    elif args.dataset:
        minari.load_dataset(args.dataset, download=True)
        print(f"downloaded {args.dataset}")
    else:
        for name in (
            "D4RL/pointmaze/umaze-v2",
            "mujoco/halfcheetah/simple-v0",
            "mujoco/hopper/simple-v0",
        ):
            print(f"downloading {name}...")
            try:
                minari.load_dataset(name, download=True)
            except Exception as e:
                print(f"  failed: {e}")


def main(argv=None) -> None:
    """``python -m dadiff_tpu.cli <command> [...]`` dispatcher.

    Commands map to the console scripts (pyproject.toml):
    train / train-values / eval / download.
    """
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    commands = {
        "train": train_main,
        "train-values": train_value_main,
        "eval": evaluate_main,
        "evaluate": evaluate_main,
        "download": download_main,
    }
    usage = "usage: python -m dadiff_tpu.cli {train|train-values|eval|download} ..."
    if argv and argv[0] in ("-h", "--help"):
        print(usage)
        return
    if not argv:
        raise SystemExit(usage)
    if argv[0] not in commands:
        raise SystemExit(f"{usage}\nunknown command: {argv[0]}")
    commands[argv[0]](argv[1:])


if __name__ == "__main__":
    main()
