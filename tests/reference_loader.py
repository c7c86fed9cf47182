"""Load reference (torch) modules from /root/reference for golden parity tests.

The reference package crashes at import (`m_diffuser/__init__.py` imports the
missing `datasets` module — SURVEY.md caveat), so we import the individual
model modules under a synthetic package name without executing the package
__init__. Read-only use: the reference is the golden oracle, never a source.
"""

import importlib.util
import os
import sys

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "m_diffuser"))


def load_reference_models():
    """Returns (temporal_unet_module, diffusion_module) from the reference."""
    pkg_name = "_ref_models"
    if pkg_name in sys.modules:
        return (
            sys.modules[f"{pkg_name}.temporal_unet"],
            sys.modules[f"{pkg_name}.diffusion"],
        )

    models_dir = os.path.join(REFERENCE_ROOT, "m_diffuser", "models")

    # Synthetic namespace package so diffusion.py's relative import
    # `from .temporal_unet import TemporalUnet` resolves.
    spec = importlib.util.spec_from_loader(pkg_name, loader=None, is_package=True)
    pkg = importlib.util.module_from_spec(spec)
    pkg.__path__ = [models_dir]
    sys.modules[pkg_name] = pkg

    mods = {}
    for name in ("temporal_unet", "diffusion"):
        full = f"{pkg_name}.{name}"
        mspec = importlib.util.spec_from_file_location(
            full, os.path.join(models_dir, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(mspec)
        sys.modules[full] = mod
        mspec.loader.exec_module(mod)
        mods[name] = mod
    return mods["temporal_unet"], mods["diffusion"]
