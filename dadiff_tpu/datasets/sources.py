"""Episode sources: minari (gated), gymnasium rollouts, synthetic, npz files.

The canonical episode format is a list of dicts:
    {'observations': (T+1, obs_dim) float32, 'actions': (T, act_dim) float32}
with dict observations (PointMaze-style) flattened to
``concat([observation, desired_goal])`` when a goal is present — matching the
goal-conditioned layout the reference policies expect
(reference policies.py:151-179 `_process_observation`).

minari is an optional dependency (it is absent in some deploy images, and
downloads need network); every other source is hermetic.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

Episode = Dict[str, np.ndarray]  # observations (T+1,d), actions (T,m), rewards? (T,)


# ---------------------------------------------------------------------------
# Observation flattening (reference policies.py:151-179 semantics)
# ---------------------------------------------------------------------------

def flatten_observation(obs: Any, include_goal: bool = True) -> np.ndarray:
    """Flatten a (possibly dict) observation to a 1-D array.

    Mirrors GuidedPolicy._process_observation: goal-conditioned envs yield
    ``concat([observation, desired_goal])``; otherwise the raw array.
    """
    if isinstance(obs, dict):
        if "observation" in obs and "desired_goal" in obs and include_goal:
            return np.concatenate(
                [np.ravel(obs["observation"]), np.ravel(obs["desired_goal"])]
            ).astype(np.float32)
        if "observation" in obs:
            return np.ravel(obs["observation"]).astype(np.float32)
        if "achieved_goal" in obs:
            return np.ravel(obs["achieved_goal"]).astype(np.float32)
        return np.concatenate([np.ravel(v) for v in obs.values()]).astype(np.float32)
    return np.ravel(np.asarray(obs, dtype=np.float32))


def _flatten_episode_observations(obs: Any, include_goal: bool) -> np.ndarray:
    """Vectorized episode-level version of :func:`flatten_observation`."""
    if isinstance(obs, dict):
        if "observation" in obs and "desired_goal" in obs and include_goal:
            return np.concatenate(
                [np.asarray(obs["observation"]), np.asarray(obs["desired_goal"])],
                axis=-1,
            ).astype(np.float32)
        if "observation" in obs:
            return np.asarray(obs["observation"], dtype=np.float32)
        if "achieved_goal" in obs:
            return np.asarray(obs["achieved_goal"], dtype=np.float32)
        return np.concatenate(
            [np.asarray(v).reshape(len(next(iter(obs.values()))), -1) for v in obs.values()],
            axis=-1,
        ).astype(np.float32)
    return np.asarray(obs, dtype=np.float32)


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------

def minari_available() -> bool:
    try:
        import minari  # noqa: F401

        return True
    except ImportError:
        return False


def load_minari_episodes(
    dataset_name: str,
    max_episodes: Optional[int] = None,
    include_goal: bool = True,
) -> List[Episode]:
    """Load a Minari dataset into the canonical episode format
    (reference data layer's implied source; data_driven.py:24-49 shows the
    dict-observation handling)."""
    try:
        import minari
    except ImportError as e:
        raise ImportError(
            "minari is not installed in this image. Use a 'synthetic:*', "
            "'gym:*', or 'npz:<path>' dataset spec instead, or install minari."
        ) from e

    dataset = minari.load_dataset(dataset_name)
    episodes: List[Episode] = []
    for i, ep in enumerate(dataset):
        if max_episodes is not None and i >= max_episodes:
            break
        obs = _flatten_episode_observations(ep.observations, include_goal)
        episode: Episode = {
            "observations": obs.astype(np.float32),
            "actions": np.asarray(ep.actions, dtype=np.float32),
        }
        if getattr(ep, "rewards", None) is not None:
            episode["rewards"] = np.asarray(ep.rewards, dtype=np.float32)
        episodes.append(episode)
    return episodes


def collect_gym_episodes(
    env_name: str,
    n_episodes: int = 50,
    max_steps: int = 300,
    policy=None,
    seed: int = 0,
    include_goal: bool = True,
    env_kwargs: Optional[dict] = None,
) -> List[Episode]:
    """Collect episodes by rolling out a policy (default: uniform random) in a
    gymnasium environment. Replaces minari downloads in network-less images
    (analogue of reference extractor.py:333-382 `_collect_trajectories`)."""
    import gymnasium as gym

    try:  # registers PointMaze / AdroitHand etc.
        import gymnasium_robotics  # noqa: F401
    except ImportError:
        pass

    env = gym.make(env_name, **(env_kwargs or {}))
    episodes: List[Episode] = []
    for ep_idx in range(n_episodes):
        obs, _ = env.reset(seed=seed + ep_idx)
        obs_list = [flatten_observation(obs, include_goal)]
        act_list, rew_list = [], []
        for _ in range(max_steps):
            if policy is None:
                action = env.action_space.sample()
            else:
                action = policy(obs)
            obs, reward, terminated, truncated, _ = env.step(action)
            obs_list.append(flatten_observation(obs, include_goal))
            act_list.append(np.asarray(action, dtype=np.float32))
            rew_list.append(float(reward))
            if terminated or truncated:
                break
        episodes.append(
            {
                "observations": np.stack(obs_list).astype(np.float32),
                "actions": np.stack(act_list).astype(np.float32),
                "rewards": np.asarray(rew_list, dtype=np.float32),
            }
        )
    env.close()
    return episodes


def generate_synthetic_episodes(
    kind: str = "pointmaze",
    n_episodes: int = 64,
    episode_len: int = 128,
    seed: int = 0,
    dt: float = 0.1,
) -> List[Episode]:
    """Hermetic synthetic data: a PD-controlled double integrator steering to
    random goals. Observation layout matches goal-conditioned PointMaze:
    [x, y, vx, vy, goal_x, goal_y]; actions are accelerations [ax, ay].

    Exactly satisfies x_{t+1} = A x_t + B u_t (double integrator, reference
    extractor.py:93-133), which makes it the ideal fixture for the dynamics
    subsystem: sysID recovers (A, B) to machine precision and projection
    residuals are ~0 on-manifold.
    """
    if kind not in ("pointmaze", "double_integrator"):
        raise ValueError(f"Unknown synthetic dataset kind: {kind}")

    rng = np.random.RandomState(seed)
    A = np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    B = np.array([[0.5 * dt**2, 0], [0, 0.5 * dt**2], [dt, 0], [0, dt]], np.float32)

    episodes: List[Episode] = []
    for _ in range(n_episodes):
        x = np.concatenate([rng.uniform(-3, 3, 2), rng.uniform(-0.5, 0.5, 2)]).astype(
            np.float32
        )
        goal = rng.uniform(-3, 3, 2).astype(np.float32)
        obs_list, act_list, rew_list = [], [], []
        for _ in range(episode_len):
            obs_list.append(np.concatenate([x, goal]))
            u = 1.2 * (goal - x[:2]) - 1.5 * x[2:]  # PD toward goal
            u = np.clip(u + rng.normal(0, 0.3, 2), -1, 1).astype(np.float32)
            act_list.append(u)
            x = A @ x + B @ u
            rew_list.append(np.exp(-np.linalg.norm(x[:2] - goal)))  # dense reward
        obs_list.append(np.concatenate([x, goal]))
        episodes.append(
            {
                "observations": np.stack(obs_list).astype(np.float32),
                "actions": np.stack(act_list).astype(np.float32),
                "rewards": np.asarray(rew_list, dtype=np.float32),
            }
        )
    return episodes


def save_episodes_npz(path: str, episodes: Sequence[Episode]) -> None:
    """Persist episodes as a single .npz (hermetic dataset cache)."""
    arrays = {}
    for i, ep in enumerate(episodes):
        arrays[f"obs_{i}"] = ep["observations"]
        arrays[f"act_{i}"] = ep["actions"]
        if "rewards" in ep:
            arrays[f"rew_{i}"] = ep["rewards"]
    arrays["n_episodes"] = np.asarray(len(episodes))
    np.savez_compressed(path, **arrays)


def load_episodes_npz(path: str) -> List[Episode]:
    data = np.load(path)
    n = int(data["n_episodes"])
    episodes = []
    for i in range(n):
        ep = {"observations": data[f"obs_{i}"], "actions": data[f"act_{i}"]}
        if f"rew_{i}" in data:
            ep["rewards"] = data[f"rew_{i}"]
        episodes.append(ep)
    return episodes


def load_episodes(spec: str, **kwargs) -> List[Episode]:
    """Dispatch a dataset spec to a source.

    Specs:
        'synthetic:<kind>[:n=<episodes>,T=<len>]'   hermetic generator
        'npz:<path>'                                cached episodes
        'gym:<EnvName>[:n=<episodes>]'              random-policy collection
        'expert:<EnvName>[:n=<episodes>,noise=<f>,corner_safe=1,lookahead=1]'
                                                    waypoint-expert collection
                                                    (maze envs; regenerates
                                                    D4RL-style data locally;
                                                    corner_safe offsets turn
                                                    waypoints off inner wall
                                                    corners; lookahead skips
                                                    straight-run waypoints)
        'mppi:<EnvName>[:n=<episodes>,T=<len>]'     MPPI-expert collection
                                                    (locomotion envs; stands
                                                    in for Minari expert sets)
        anything else                               Minari dataset name
        (e.g. 'D4RL/pointmaze/umaze-v2', reference registry.py:30-34)

    Specs may be mixed with '+' (e.g. 'npz:seeds.npz+npz:engine.npz'):
    the episode lists are concatenated in order — the documented
    clean-seed + engine-data training mixes without an ad-hoc merge step.
    """
    if "+" in spec:
        episodes = []
        for part in spec.split("+"):
            episodes.extend(load_episodes(part, **kwargs))
        return episodes
    if spec.startswith("synthetic:"):
        rest = spec.split(":", 1)[1]
        parts = rest.split(":")
        kind = parts[0]
        opts = dict(p.split("=") for p in parts[1].split(",")) if len(parts) > 1 else {}
        return generate_synthetic_episodes(
            kind=kind,
            n_episodes=int(opts.get("n", kwargs.pop("n_episodes", 64))),
            episode_len=int(opts.get("T", kwargs.pop("episode_len", 128))),
            seed=int(opts.get("seed", kwargs.pop("seed", 0))),
        )
    if spec.startswith("npz:"):
        return load_episodes_npz(spec[len("npz:"):])
    if spec.startswith("expert:"):
        from dadiff_tpu.envs.expert import collect_expert_episodes

        rest = spec.split(":", 1)[1]
        parts = rest.split(":")
        opts = dict(p.split("=") for p in parts[1].split(",")) if len(parts) > 1 else {}
        return collect_expert_episodes(
            env_name=parts[0],
            n_episodes=int(opts.get("n", kwargs.pop("n_episodes", 100))),
            max_steps=int(opts.get("T", kwargs.pop("max_steps", 300))),
            noise=float(opts.get("noise", kwargs.pop("noise", 0.2))),
            seed=int(opts.get("seed", kwargs.pop("seed", 0))),
            corner_safe=bool(int(opts.get("corner_safe", kwargs.pop("corner_safe", 0)))),
            lookahead=bool(int(opts.get("lookahead", kwargs.pop("lookahead", 0)))),
        )
    if spec.startswith("mppi:"):
        from dadiff_tpu.envs.mppi_expert import collect_mppi_episodes

        rest = spec.split(":", 1)[1]
        parts = rest.split(":")
        opts = dict(p.split("=") for p in parts[1].split(",")) if len(parts) > 1 else {}
        return collect_mppi_episodes(
            env_name=parts[0],
            n_episodes=int(opts.get("n", kwargs.pop("n_episodes", 40))),
            max_steps=int(opts.get("T", kwargs.pop("max_steps", 1000))),
            seed=int(opts.get("seed", kwargs.pop("seed", 0))),
        )
    if spec.startswith("gym:"):
        rest = spec.split(":", 1)[1]
        parts = rest.split(":")
        opts = dict(p.split("=") for p in parts[1].split(",")) if len(parts) > 1 else {}
        return collect_gym_episodes(
            parts[0],
            n_episodes=int(opts.get("n", kwargs.pop("n_episodes", 50))),
            **kwargs,
        )
    kwargs.setdefault("max_episodes", kwargs.pop("n_episodes", None))
    return load_minari_episodes(spec, **kwargs)
