#!/usr/bin/env python
"""Evaluation CLI (thin wrapper; logic in dadiff_tpu.cli).

Reference analogue: scripts/evaluate.py. Example (seed-paired A/B, the
reference's canonical protocol, README.md:96-128):

    python scripts/evaluate.py --checkpoint logs/.../checkpoint_step_N.pt \
        --env PointMaze_UMaze-v3 --policy-type guided --seed 42
    python scripts/evaluate.py --checkpoint logs/.../checkpoint_step_N.pt \
        --env PointMaze_UMaze-v3 --policy-type dynamics-aware --seed 42
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass

from dadiff_tpu.cli import evaluate_main

if __name__ == "__main__":
    evaluate_main()
