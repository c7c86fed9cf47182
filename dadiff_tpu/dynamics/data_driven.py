"""Data-driven linear system identification (least squares).

Mirrors reference m_diffuser/dynamics/data_driven.py:11-165 but works on the
framework's canonical episode lists, so it is source-agnostic: minari,
gymnasium rollouts, synthetic, or npz all feed the same fit.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from dadiff_tpu.datasets.sources import Episode, load_episodes


def extract_transitions_from_episodes(
    episodes: Sequence[Episode], max_trajectories: int = 1000
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Episodes -> stacked (s_t, a_t, s_{t+1}) arrays
    (reference data_driven.py:11-72, vectorized instead of per-step loops)."""
    states, actions, next_states = [], [], []
    for ep in episodes[:max_trajectories]:
        obs = np.asarray(ep["observations"], dtype=np.float32)
        act = np.asarray(ep["actions"], dtype=np.float32)
        T = min(len(act), len(obs) - 1)
        if T <= 0:
            continue
        states.append(obs[:T])
        actions.append(act[:T])
        next_states.append(obs[1 : T + 1])
    if not states:
        raise ValueError("No transitions found")
    return (
        np.concatenate(states),
        np.concatenate(actions),
        np.concatenate(next_states),
    )


def extract_transitions(
    dataset_name: str, max_trajectories: int = 1000
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load a dataset spec and extract transitions (reference data_driven.py:11-72)."""
    episodes = load_episodes(dataset_name)
    return extract_transitions_from_episodes(episodes, max_trajectories)


def fit_linear_dynamics(
    states: np.ndarray,
    actions: np.ndarray,
    next_states: np.ndarray,
    state_dim: Optional[int] = None,
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Least-squares fit of x_{t+1} = A x_t + B u_t
    (reference data_driven.py:75-134), with optional truncation to the
    physical state dims (drops goal columns, reference :93-96).

    Returns (A, B) plus R² via `fit_linear_dynamics.last_r2` for diagnostics.
    """
    states = np.asarray(states, dtype=np.float64)
    actions = np.asarray(actions, dtype=np.float64)
    next_states = np.asarray(next_states, dtype=np.float64)

    if state_dim is not None and states.shape[1] > state_dim:
        states = states[:, :state_dim]
        next_states = next_states[:, :state_dim]

    n = states.shape[1]
    Phi = np.hstack([states, actions])
    Theta, *_ = np.linalg.lstsq(Phi, next_states, rcond=None)

    A = Theta[:n].T
    B = Theta[n:].T

    residuals = next_states - Phi @ Theta
    ss_res = float(np.sum(residuals**2))
    ss_tot = float(np.sum((next_states - next_states.mean(axis=0)) ** 2))
    r2 = 1.0 - ss_res / max(ss_tot, 1e-12)
    fit_linear_dynamics.last_r2 = r2
    if verbose:
        print(
            f"sysID: N={len(states)} n={n} m={actions.shape[1]} R²={r2:.4f} "
            f"mean|err|={np.mean(np.linalg.norm(residuals, axis=1)):.6f}"
        )
    return A, B


fit_linear_dynamics.last_r2 = None


def identify_dynamics_from_data(
    dataset_name: Optional[str] = None,
    state_dim: Optional[int] = None,
    max_trajectories: int = 1000,
    episodes: Optional[Sequence[Episode]] = None,
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Full pipeline: transitions -> (A, B, state_dim, action_dim)
    (reference data_driven.py:137-165)."""
    if episodes is not None:
        states, actions, next_states = extract_transitions_from_episodes(
            episodes, max_trajectories
        )
    else:
        states, actions, next_states = extract_transitions(dataset_name, max_trajectories)
    if state_dim is None:
        state_dim = states.shape[1]
    action_dim = actions.shape[1]
    A, B = fit_linear_dynamics(states, actions, next_states, state_dim)
    return A, B, state_dim, action_dim
