"""Make ``dadiff_tpu`` importable when scripts run from a plain checkout.

``python scripts/train.py`` puts ``scripts/`` (not the repo root) at
``sys.path[0]``, so without ``pip install -e .`` the package import fails.
Every script imports this module first; it is a no-op when the package is
already installed.
"""

import os
import sys

try:  # installed (pip install -e .) — nothing to do
    import dadiff_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
