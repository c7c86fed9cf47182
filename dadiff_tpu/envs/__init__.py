"""Environment layer.

host.py: gymnasium-backed episode evaluation (the official comparison path,
matching the reference protocol, evaluate.py:206-269).
pointmaze_jax.py: pure-JAX batched PointMaze so plan->step->replan runs
entirely on device (the MJX-style path; MJX itself is not in this image).
rollout.py: the fully on-device batched plan->step->replan loop.
"""

from dadiff_tpu.envs.host import evaluate_policy, make_env, save_results
from dadiff_tpu.envs.pointmaze_jax import PointMazeJax, MAZE_MAPS

__all__ = [
    "evaluate_policy",
    "make_env",
    "save_results",
    "PointMazeJax",
    "MAZE_MAPS",
]
