#!/usr/bin/env python
"""Dataset management CLI (thin wrapper; logic in dadiff_tpu.cli).

Reference analogue: scripts/download_data.py (minari downloads), extended
with hermetic collection:

    python scripts/download_data.py --collect synthetic:pointmaze \
        --episodes 200 --out data/pointmaze.npz
    python scripts/download_data.py --collect gym:PointMaze_UMaze-v3 \
        --episodes 50 --out data/pointmaze_rollouts.npz
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass

from dadiff_tpu.cli import download_main

if __name__ == "__main__":
    download_main()
