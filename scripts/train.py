#!/usr/bin/env python
"""Training CLI (thin wrapper; logic in dadiff_tpu.cli).

Reference analogue: scripts/train.py. Examples:

    # hermetic PointMaze-style training on synthetic double-integrator data
    python scripts/train.py --dataset synthetic:pointmaze --horizon 32 \
        --dim 64 --dim-mults 1 2 4 --n-timesteps 100 --n-epochs 20

    # with the dynamics projection loss
    python scripts/train.py --dataset synthetic:pointmaze --projection-weight 0.1

    # from a YAML experiment file (actually consumed, unlike the reference)
    python scripts/train.py --config configs/experiments/pointmaze.yaml
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass

from dadiff_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
