"""Registry mapping env names -> dynamics method / state dims / datasets
(reference m_diffuser/dynamics/registry.py:12-112)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from dadiff_tpu.dynamics.data_driven import identify_dynamics_from_data
from dadiff_tpu.dynamics.extractor import get_dynamics_extractor

# Environment name patterns -> dynamics method (reference registry.py:12-18)
DYNAMICS_REGISTRY = {
    "pointmaze": "data_driven",
    "maze": "data_driven",
    "halfcheetah": "data_driven",
    "hopper": "data_driven",
    "walker": "data_driven",
}

# Physical state dims, excluding goals (reference registry.py:21-27)
STATE_DIM_REGISTRY = {
    "pointmaze": 4,  # [x, y, vx, vy]
    "maze": 4,
    "halfcheetah": 17,
    "hopper": 11,
    "walker": 17,
}

# env -> Minari dataset names (reference registry.py:30-34)
DATASET_REGISTRY = {
    "pointmaze_umaze": "D4RL/pointmaze/umaze-v2",
    "pointmaze_medium": "D4RL/pointmaze/medium-v2",
    "pointmaze_large": "D4RL/pointmaze/large-v2",
}


def get_dynamics_for_env(
    env_name: str,
    dataset_name: Optional[str] = None,
    method: Optional[str] = None,
    linearization_point: Optional[np.ndarray] = None,
    episodes=None,
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Resolve (A, B, state_dim, action_dim) for an environment
    (reference registry.py:37-112), with two robustness upgrades:

      * accepts pre-loaded ``episodes`` for hermetic/data-driven sysID,
      * falls back to the analytical double integrator for maze envs when the
        dataset source is unavailable (e.g. no minari in the image), instead
        of crashing.
    """
    if method is None:
        method = "numerical"
        for pattern, dynamics_type in DYNAMICS_REGISTRY.items():
            if pattern in env_name.lower():
                method = dynamics_type
                break
    method = method.replace("-", "_")

    state_dim = None
    for pattern, dim in STATE_DIM_REGISTRY.items():
        if pattern in env_name.lower():
            state_dim = dim
            break

    if method == "data_driven":
        if episodes is not None:
            return identify_dynamics_from_data(state_dim=state_dim, episodes=episodes)
        if dataset_name is None:
            env_key = env_name.lower().replace("-", "_").replace("_v3", "")
            dataset_name = DATASET_REGISTRY.get(env_key)
        if dataset_name is not None:
            try:
                return identify_dynamics_from_data(dataset_name, state_dim=state_dim)
            except Exception as e:
                print(f"data-driven sysID failed ({e}); falling back")
        else:
            print(
                f"WARNING: no dataset resolves for {env_name}; data-driven "
                "sysID unavailable"
            )
        method = "analytical" if "maze" in env_name.lower() else "trajectory"
        print(
            f"WARNING: dynamics for {env_name} degrade to '{method}' "
            "identification"
            + (" (random-rollout fit)" if method == "trajectory" else "")
        )

    extractor = get_dynamics_extractor(env_name, method=method)
    try:
        if method == "trajectory" and dataset_name is not None:
            A, B = extractor.get_dynamics(use_dataset=dataset_name)
        else:
            A, B = extractor.get_dynamics(linearization_point)
        return A, B, extractor.state_dim, extractor.action_dim
    finally:
        extractor.close()
