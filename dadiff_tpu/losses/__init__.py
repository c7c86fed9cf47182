"""Composable training objectives (reference: m_diffuser/losses/__init__.py).

Losses are callables ``(params, batch, rng) -> (loss, metrics_dict)`` that
compose into one jitted value_and_grad — the functional analogue of the
reference's nn.Module loss classes (losses/__init__.py:13-227), designed so
the whole composed objective differentiates and shards as a single XLA
program.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.ops.projection import NormStats, projection_residual

LossFn = Callable[..., Tuple[jax.Array, Dict[str, jax.Array]]]


class BaseLoss:
    """Weighted loss base (reference losses/__init__.py:13-35)."""

    name = "loss"

    def __init__(self, weight: float = 1.0):
        self.weight = weight

    def compute(self, params, batch, rng) -> jax.Array:
        raise NotImplementedError

    def __call__(self, params, batch, rng):
        value = self.compute(params, batch, rng)
        return self.weight * value, {self.name: value}


class DiffusionLoss(BaseLoss):
    """Standard denoising loss on batch['conditions']
    (reference losses/__init__.py:38-48)."""

    name = "diffusion"

    def __init__(self, diffusion: GaussianDiffusion, weight: float = 1.0):
        super().__init__(weight)
        self.diffusion = diffusion

    def compute(self, params, batch, rng):
        return self.diffusion.loss(params, rng, batch["conditions"])


class ProjectionLoss(BaseLoss):
    """Soft dynamics penalty ||tau - P tau||^2 in physical space
    (reference losses/__init__.py:51-186)."""

    name = "projection"

    def __init__(
        self,
        projection_matrix,
        normalizer,
        state_dim: int,
        action_dim: int,
        observation_dim: int,
        horizon: int,
        weight: float = 0.1,
    ):
        super().__init__(weight)
        self.P = jnp.asarray(projection_matrix, jnp.float32)
        self.stats = NormStats.from_normalizer(normalizer)
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.observation_dim = observation_dim
        # kept for reference API parity (losses/__init__.py:61-77 takes and
        # stores horizon); the residual derives shapes from the arrays
        self.horizon = horizon

    def compute(self, params, batch, rng):
        del params, rng
        return projection_residual(
            batch["conditions"],
            self.P,
            self.stats,
            observation_dim=self.observation_dim,
            action_dim=self.action_dim,
            state_dim=self.state_dim,
        )


class ComposedLoss:
    """Weighted sum of losses returning (total, breakdown)
    (reference losses/__init__.py:189-227)."""

    def __init__(self, losses: Sequence[BaseLoss]):
        self.losses = list(losses)

    @property
    def names(self) -> List[str]:
        return [loss.name for loss in self.losses]

    def __call__(self, params, batch, rng):
        total = jnp.asarray(0.0, jnp.float32)
        metrics: Dict[str, jax.Array] = {}
        for i, loss in enumerate(self.losses):
            value, sub = loss(params, batch, jax.random.fold_in(rng, i))
            total = total + value
            metrics.update(sub)
        metrics["total"] = total
        return total, metrics


def build_loss(
    diffusion: GaussianDiffusion,
    *,
    projection_weight: float = 0.0,
    projection_matrix=None,
    normalizer=None,
    state_dim: Optional[int] = None,
) -> Tuple[Callable, List[str]]:
    """Compose the training objective (reference train.py:237-311, minus its
    `action_dim_dynamics` NameError bug which we do not replicate)."""
    losses: List[BaseLoss] = [DiffusionLoss(diffusion)]
    if projection_weight > 0:
        if projection_matrix is None or normalizer is None or state_dim is None:
            raise ValueError(
                "projection loss requires projection_matrix, normalizer, state_dim"
            )
        losses.append(
            ProjectionLoss(
                projection_matrix,
                normalizer,
                state_dim=state_dim,
                action_dim=diffusion.action_dim,
                observation_dim=diffusion.observation_dim,
                horizon=diffusion.horizon,
                weight=projection_weight,
            )
        )
    composed = ComposedLoss(losses)
    return composed, composed.names
