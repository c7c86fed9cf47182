"""Training infrastructure: jitted train step, EMA, LR schedule, Trainer,
checkpointing (reference: m_diffuser/utils/training.py).

The reference train step is host-driven: H2D copy, forward, backward, clip,
Adam, scheduler, EMA — seven framework hops per step (training.py:144-178).
Here the whole step (loss + grad + clip + Adam + EMA) is ONE jitted XLA
program with donated state, fed by a double-buffered device prefetch; under a
mesh, the batch is sharded over 'dp' and XLA all-reduces the gradients over
ICI automatically.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from dadiff_tpu.datasets.sequence import prefetch_to_device
from dadiff_tpu.models.diffusion import GaussianDiffusion


# ---------------------------------------------------------------------------
# LR schedule (reference CosineAnnealingWarmup, training.py:284-320)
# ---------------------------------------------------------------------------

def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int, min_lr: float = 0.0
) -> optax.Schedule:
    """Linear warmup then cosine decay; exact reference semantics
    (lr = base*scale + min_lr*(1-scale))."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(progress, 0.0, 1.0)))
        scale = jnp.where(step < warmup_steps, warm, cosine)
        return base_lr * scale + min_lr * (1.0 - scale)

    return schedule


# ---------------------------------------------------------------------------
# EMA (reference training.py:18-62 / :180-189)
# ---------------------------------------------------------------------------

class EMA:
    """Shadow-parameter EMA: shadow = decay*shadow + (1-decay)*param
    (reference Trainer.update_ema, training.py:180-189). Functional — the
    shadow lives in TrainState; this class matches the reference API shape."""

    def __init__(self, params, decay: float = 0.995):
        self.decay = decay
        self.shadow = jax.tree_util.tree_map(jnp.copy, params)

    def update(self, params):
        self.shadow = ema_update(self.shadow, params, self.decay)
        return self.shadow


def ema_update(shadow, params, decay: float):
    return jax.tree_util.tree_map(
        lambda s, p: decay * s + (1.0 - decay) * p, shadow, params
    )


# ---------------------------------------------------------------------------
# Train state + step
# ---------------------------------------------------------------------------

class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled


def make_optimizer(
    lr: float | optax.Schedule, gradient_clip: float = 1.0
) -> optax.GradientTransformation:
    """clip_by_global_norm -> Adam (reference training.py:155-166 + train.py:407)."""
    chain = []
    if gradient_clip and gradient_clip > 0:
        chain.append(optax.clip_by_global_norm(gradient_clip))
    chain.append(optax.adam(lr))
    return optax.chain(*chain)


def make_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    *,
    use_ema: bool = True,
    ema_decay: float = 0.995,
    donate: bool = True,
    skip_nonfinite: bool = False,
    loss_takes_ema: bool = False,
):
    """Build the single fused train step:
    loss -> grad -> clip -> adam -> EMA, all inside one jit.

    With ``skip_nonfinite``, a batch producing non-finite gradients skips the
    update (zero gradients) and reports ``nonfinite=1`` — cheap fault
    containment for long unattended runs (the reference has none, SURVEY §5).

    With ``loss_takes_ema``, the loss is called as
    ``loss_fn(params, batch, rng, ema_params)`` — the EMA slot doubles as a
    slow-moving TARGET network (consistency distillation's theta^-; the loss
    must stop_gradient through it). Requires ``use_ema=True``.
    """
    if loss_takes_ema and not use_ema:
        raise ValueError("loss_takes_ema requires use_ema=True")

    def step(state: TrainState, batch, rng):
        def compute(params):
            if loss_takes_ema:
                loss, metrics = loss_fn(params, batch, rng, state.ema_params)
            else:
                loss, metrics = loss_fn(params, batch, rng)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        metrics = dict(metrics)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            # Discard the ENTIRE update on a non-finite batch: params AND
            # optimizer state. Merely zeroing the gradients would still let
            # Adam step along stale momentum (and advance its bias
            # correction) — parameter drift with no fresh gradient signal.
            from dadiff_tpu.utils.debug import tree_all_finite

            finite = tree_all_finite(grads)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old),
                params, state.params,
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old)
                if getattr(new, "ndim", None) is not None else new,
                opt_state, state.opt_state,
            )
            metrics["nonfinite"] = 1.0 - finite.astype(jnp.float32)
        ema_params = state.ema_params
        if use_ema and ema_params is not None:
            ema_params = ema_update(ema_params, params, ema_decay)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Epoch-driven trainer with logging + checkpointing
    (reference Trainer, training.py:65-279).

    Args:
        diffusion: model bundle (for checkpoint config/export).
        train_loader: iterable of {'conditions': (B,H,D)} numpy batches.
        loss_fn: (params, batch, rng) -> (loss, metrics) — e.g. losses.build_loss.
        mesh: optional jax Mesh; batches are sharded over 'dp' and params
            replicated (XLA inserts the gradient all-reduce).
    """

    def __init__(
        self,
        diffusion: GaussianDiffusion,
        train_loader,
        loss_fn: Callable,
        *,
        params=None,
        lr: float = 3e-4,
        warmup_steps: int = 0,
        total_steps: Optional[int] = None,
        gradient_clip: float = 1.0,
        use_ema: bool = True,
        ema_decay: float = 0.995,
        log_dir: str = "./logs",
        save_freq: int = 10000,
        eval_freq: int = 5000,
        log_freq: int = 50,
        loss_names: Optional[List[str]] = None,
        mesh=None,
        seed: int = 0,
        export_pt: bool = True,
        skip_nonfinite: bool = False,
        val_batch=None,
        normalizer=None,
        loss_takes_ema: bool = False,
        extra_config: Optional[Dict[str, Any]] = None,
    ):
        self.diffusion = diffusion
        self.train_loader = train_loader
        self.loss_fn = loss_fn
        self.log_dir = log_dir
        self.save_freq = save_freq
        self.eval_freq = eval_freq
        self.log_freq = log_freq
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self.loss_names = loss_names or ["diffusion"]
        self.mesh = mesh
        self.export_pt = export_pt
        self.normalizer = normalizer
        self.extra_config = dict(extra_config) if extra_config else {}

        os.makedirs(log_dir, exist_ok=True)
        self._log_file = open(os.path.join(log_dir, "training.log"), "a")
        # structured metrics stream (observability upgrade over the
        # reference's text-only training.log, training.py:269-273)
        self._metrics_file = open(os.path.join(log_dir, "metrics.jsonl"), "a")

        self._rng = jax.random.PRNGKey(seed)
        if params is None:
            self._rng, init_key = jax.random.split(self._rng)
            params = diffusion.init_params(init_key)

        if not hasattr(train_loader, "__len__"):
            raise TypeError(
                "train_loader must be a sized, re-iterable loader (e.g. "
                "datasets.create_dataloader) — a one-shot generator would "
                "silently yield zero-step epochs after the first"
            )
        total_steps = total_steps or (len(train_loader) * 100)
        self.lr_schedule = warmup_cosine_schedule(lr, warmup_steps, total_steps)
        self.optimizer = make_optimizer(self.lr_schedule, gradient_clip)

        self.state = TrainState(
            step=jnp.asarray(0),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
        )

        self._batch_sharding = None
        if mesh is not None:
            from dadiff_tpu.parallel.mesh import batch_sharding, replicated_sharding

            self._batch_sharding = batch_sharding(mesh)
            self.state = jax.device_put(self.state, replicated_sharding(mesh))

        self._train_step = make_train_step(
            loss_fn, self.optimizer, use_ema=use_ema, ema_decay=ema_decay,
            skip_nonfinite=skip_nonfinite, loss_takes_ema=loss_takes_ema,
        )
        self.global_step = 0

        # Optional held-out validation (the reference accepts eval_freq but
        # never evaluates; here it drives a real val-loss probe).
        self._val_batch = None
        self._eval_step = None
        if val_batch is not None:
            self._val_batch = {
                k: jax.device_put(v, self._batch_sharding)
                if self._batch_sharding is not None else jnp.asarray(v)
                for k, v in val_batch.items()
            }
            self._eval_step = jax.jit(
                lambda params, batch, rng: loss_fn(params, batch, rng)[0]
            )

    def evaluate(self, use_ema: bool = False) -> Optional[float]:
        """Held-out loss on the validation batch (None if not configured)."""
        if self._val_batch is None:
            return None
        params = self.state.ema_params if (use_ema and self.state.ema_params
                                           is not None) else self.state.params
        self._rng, key = jax.random.split(self._rng)
        return float(self._eval_step(params, self._val_batch, key))

    # -- core loop ------------------------------------------------------------
    def train_step(self, batch) -> Dict[str, float]:
        """One fused step; returns host metrics (reference training.py:144-178)."""
        self._rng, key = jax.random.split(self._rng)
        self.state, metrics = self._train_step(self.state, batch, key)
        self.global_step = int(self.state.step)
        return {k: float(v) for k, v in metrics.items()}

    def train(self, n_epochs: int, start_epoch: int = 0) -> Dict[str, List[float]]:
        """Main loop (reference training.py:226-279). Returns loss history."""
        history: Dict[str, List[float]] = {}
        for epoch in range(start_epoch, start_epoch + n_epochs):
            epoch_metrics: Dict[str, List[float]] = {}
            t0 = time.time()
            n_steps = 0
            batches = prefetch_to_device(
                iter(self.train_loader), size=2, sharding=self._batch_sharding
            )
            for batch in batches:
                self._rng, key = jax.random.split(self._rng)
                self.state, metrics = self._train_step(self.state, batch, key)
                n_steps += 1
                self.global_step = self.global_step + 1

                if n_steps == 1 or (
                    self.log_freq and n_steps % self.log_freq == 0
                ):
                    host = {k: float(v) for k, v in metrics.items()}
                    for k, v in host.items():
                        epoch_metrics.setdefault(k, []).append(v)

                if self.save_freq and self.global_step % self.save_freq == 0:
                    self.save_checkpoint(epoch)

                if (self._val_batch is not None and self.eval_freq
                        and self.global_step % self.eval_freq == 0):
                    val = self.evaluate()
                    epoch_metrics.setdefault("val_loss", []).append(val)

            dt = time.time() - t0
            sps = n_steps / max(dt, 1e-9)
            summary = {
                k: float(np.mean(v)) for k, v in epoch_metrics.items() if v
            }
            line = (
                f"Epoch {epoch + 1}: "
                + " ".join(f"{k}={v:.4f}" for k, v in summary.items())
                + f" steps/s={sps:.2f}"
            )
            print(line)
            self._log_file.write(line + "\n")
            self._log_file.flush()
            self._metrics_file.write(json.dumps({
                "epoch": epoch + 1,
                "step": int(self.state.step),
                "steps_per_sec": round(sps, 3),
                **{k: round(v, 6) for k, v in summary.items()},
            }) + "\n")
            self._metrics_file.flush()
            for k, v in summary.items():
                history.setdefault(k, []).append(v)

        self.global_step = int(self.state.step)
        self.save_checkpoint(start_epoch + n_epochs - 1, final=True)
        return history

    def close(self) -> None:
        for f in (self._log_file, self._metrics_file):
            try:
                f.close()
            except Exception:
                pass

    def __del__(self):  # best-effort handle cleanup
        self.close()

    # -- checkpointing (reference training.py:191-224 schema) -----------------
    def _config_dict(self) -> Dict[str, Any]:
        d = self.diffusion
        cfg = {
            "horizon": d.horizon,
            "observation_dim": d.observation_dim,
            "action_dim": d.action_dim,
            "n_timesteps": d.n_timesteps,
            "beta_schedule": d.beta_schedule,
            "dim": d.model.dim,
            "dim_mults": list(d.model.dim_mults),
            "predict_epsilon": d.predict_epsilon,
            "clip_denoised": d.clip_denoised,
        }
        if getattr(d, "prediction", None):
            cfg["prediction"] = d.prediction
        # Second model family (TemporalTransformer): record the type and its
        # own hyperparameters so load_model rebuilds the right architecture.
        model_type = type(d.model).__name__
        if model_type != "TemporalUnet":
            cfg["model_type"] = (
                "transformer" if model_type == "TemporalTransformer"
                else model_type
            )
            for key in ("depth", "n_heads", "mlp_ratio"):
                if hasattr(d.model, key):
                    cfg[key] = int(getattr(d.model, key))
        # Persist normalization stats so eval rebuilds the exact training
        # normalizer instead of re-deriving it from whatever --dataset is
        # given at eval time (which silently shifts scaling if it differs).
        if self.normalizer is not None and hasattr(self.normalizer, "as_arrays"):
            cfg["normalizer_name"] = getattr(
                self.normalizer, "normalizer_name", "stored"
            )
            cfg["normalizer_stats"] = {
                k: np.asarray(v).tolist()
                for k, v in self.normalizer.as_arrays().items()
            }
        cfg.update(self.extra_config)
        return cfg

    def save_checkpoint(self, epoch: int, final: bool = False) -> str:
        self.global_step = int(self.state.step)
        tag = f"checkpoint_step_{self.global_step}"
        base = os.path.join(self.log_dir, tag)

        # Native format: orbax pytree checkpoint of the full train state.
        from dadiff_tpu.io.checkpoints import save_native

        save_native(
            base,
            self.state,
            config=self._config_dict(),
            epoch=epoch,
        )

        # Reference-schema .pt export for interop (training.py:191-224).
        # U-Net only: the .pt schema IS the reference U-Net state_dict layout;
        # transformer checkpoints live in the native orbax format.
        if self.export_pt and type(self.diffusion.model).__name__ == "TemporalUnet":
            try:
                from dadiff_tpu.io.torch_compat import save_pt_checkpoint

                save_pt_checkpoint(
                    base + ".pt",
                    jax.device_get(self.state.params),
                    self.diffusion.schedule,
                    self._config_dict(),
                    ema_params=(
                        jax.device_get(self.state.ema_params)
                        if self.state.ema_params is not None
                        else None
                    ),
                    epoch=epoch,
                    global_step=self.global_step,
                )
            except ImportError:
                pass

        with open(os.path.join(self.log_dir, "config.json"), "w") as f:
            json.dump(self._config_dict(), f, indent=2)
        return base

    def load_latest(self, log_dir: Optional[str] = None) -> Optional[int]:
        """Preemption recovery: restore the highest-step native checkpoint in
        ``log_dir`` (None if none exists). New capability vs the reference,
        which has no failure recovery (SURVEY.md §5)."""
        import glob
        import re

        log_dir = log_dir or self.log_dir
        candidates = []
        for meta in glob.glob(os.path.join(log_dir, "checkpoint_step_*.meta.json")):
            m = re.search(r"checkpoint_step_(\d+)\.meta\.json$", meta)
            if m:
                candidates.append((int(m.group(1)), meta[: -len(".meta.json")]))
        if not candidates:
            return None
        _, base = max(candidates)
        return self.load_checkpoint(base)

    def load_checkpoint(self, path: str, reset_optimizer: bool = False) -> int:
        """Restore state; returns stored epoch (reference train.py:409-448
        resume/fine-tune semantics)."""
        from dadiff_tpu.io.checkpoints import restore_native

        state, meta = restore_native(path, self.state)
        if reset_optimizer:
            state = state.replace(
                opt_state=self.optimizer.init(state.params), step=jnp.asarray(0)
            )
        if self.mesh is not None:
            from dadiff_tpu.parallel.mesh import replicated_sharding

            state = jax.device_put(state, replicated_sharding(self.mesh))
        self.state = state
        self.global_step = int(self.state.step)
        return int(meta.get("epoch", 0))


def count_parameters(params) -> int:
    """Total parameter count (reference training.py:323-325)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def save_config(config: Dict[str, Any], save_path: str) -> None:
    """(reference training.py:328-332)"""
    with open(save_path, "w") as f:
        json.dump(config, f, indent=4)


def load_config(config_path: str) -> Dict[str, Any]:
    """(reference training.py:335-339)"""
    with open(config_path) as f:
        return json.load(f)


def create_trainer_with_custom_loss(
    model, train_loader, loss_fn, *, scheduler=None, device=None, log_dir="./logs",
    save_freq=10000, eval_freq=5000, use_ema=True, ema_decay=0.995,
    gradient_clip=1.0, loss_names=None, **kwargs,
):
    """API-parity factory (reference training.py:342-364). ``scheduler`` and
    ``device`` are accepted for signature compatibility; in JAX the schedule
    lives inside the optimizer and placement inside shardings."""
    del scheduler, device
    return Trainer(
        model, train_loader, loss_fn,
        log_dir=log_dir, save_freq=save_freq, eval_freq=eval_freq,
        use_ema=use_ema, ema_decay=ema_decay, gradient_clip=gradient_clip,
        loss_names=loss_names, **kwargs,
    )
