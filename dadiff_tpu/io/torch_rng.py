"""Seed-for-seed reproduction of the reference's torch RNG noise streams.

torch and JAX PRNGs are different algorithms, so bit-identical sampling
across frameworks requires consuming the *same* noise tensors. The reference
sampler draws, under ``torch.manual_seed(seed)``:

    x_T ~ randn(shape)                      (diffusion.py:241)
    per step t = T-1..0: eps ~ randn(shape) (diffusion.py:218)

This module replays that exact draw order with torch (CPU) and hands the
tensors to the JAX sampler's ``init_noise``/``step_noise`` hooks, giving
seed-for-seed parity with a reference run (BASELINE.json north_star
"preserving ... seed-for-seed sampler semantics on CPU"). Requires torch;
gated import.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def reference_sampling_noise(
    seed: int, n_steps: int, shape: Tuple[int, ...]
) -> Tuple[np.ndarray, np.ndarray]:
    """(init_noise (shape), step_noise (n_steps, *shape)) drawn exactly like
    the reference ``p_sample_loop`` under ``torch.manual_seed(seed)``."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    init = torch.randn(shape, generator=gen).numpy()
    steps = np.stack(
        [torch.randn(shape, generator=gen).numpy() for _ in range(n_steps)]
    )
    return init, steps


def reference_training_draw(
    seed: int, batch_size: int, n_timesteps: int, shape: Tuple[int, ...]
) -> Tuple[np.ndarray, np.ndarray]:
    """(t (B,), noise (B,...)) drawn like the reference ``loss``
    (diffusion.py:267-270: randint then randn_like)."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    t = torch.randint(0, n_timesteps, (batch_size,), generator=gen).numpy()
    noise = torch.randn(shape, generator=gen).numpy()
    return t, noise
