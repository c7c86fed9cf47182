"""Utility functions (reference: m_diffuser/utils/__init__.py). Lazy imports."""

import importlib

_EXPORTS = {
    "to_jnp": "dadiff_tpu.utils.arrays",
    "to_np": "dadiff_tpu.utils.arrays",
    "normalize": "dadiff_tpu.utils.arrays",
    "unnormalize": "dadiff_tpu.utils.arrays",
    "atleast_2d": "dadiff_tpu.utils.arrays",
    "apply_dict": "dadiff_tpu.utils.arrays",
    "set_seed": "dadiff_tpu.utils.arrays",
    "Trainer": "dadiff_tpu.utils.training",
    "EMA": "dadiff_tpu.utils.training",
    "warmup_cosine_schedule": "dadiff_tpu.utils.training",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'dadiff_tpu.utils' has no attribute {name!r}")
