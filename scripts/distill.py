#!/usr/bin/env python
"""Consistency-distillation CLI (thin wrapper; logic in dadiff_tpu.cli).

Distill a trained DDPM planner into a few-step consistency model
(models/consistency.py). Example:

    python scripts/distill.py \
        --checkpoint logs/.../checkpoint_step_3900.pt \
        --dataset npz:data/pointmaze_umaze_expert.npz --n-epochs 40

    # then evaluate at a 4-model-call budget:
    python scripts/evaluate.py --checkpoint logs/.../consistency/checkpoint_step_N.pt \
        --dataset npz:data/pointmaze_umaze_expert.npz --env PointMaze_UMaze-v3 \
        --policy-type dynamics-aware --sampler consistency --sampling-timesteps 4
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass

from dadiff_tpu.cli import distill_main

if __name__ == "__main__":
    distill_main()
