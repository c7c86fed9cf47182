"""Environment layer.

host.py: gymnasium-backed episode evaluation (the official comparison path,
matching the reference protocol, evaluate.py:206-269).
pointmaze_jax.py: pure-JAX batched PointMaze so plan->step->replan runs
entirely on device (the MJX-style path; MJX itself is not in this image).
planar_physics.py / locomotion_jax.py: exact planar MuJoCo dynamics in JAX
(HalfCheetah/Hopper/Walker2d — machine-precision one-step parity with
mujoco.mj_step; docs/physics.md) for true-physics on-device locomotion.
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


def __getattr__(name):
    # physics envs import mujoco/gymnasium at construction; lazy re-export
    # keeps `import dadiff_tpu.envs` light
    if name in ("PlanarGymEnv", "HalfCheetahJax", "HopperJax",
                "Walker2dJax", "physics_env_for"):
        from dadiff_tpu.envs import locomotion_jax

        return getattr(locomotion_jax, name)
    raise AttributeError(name)
