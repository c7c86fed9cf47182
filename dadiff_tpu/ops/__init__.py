"""Pure compute ops: schedules, diffusion math, projection, pallas kernels."""

from dadiff_tpu.ops.schedules import (
    DiffusionSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    extract,
)

__all__ = [
    "DiffusionSchedule",
    "cosine_beta_schedule",
    "linear_beta_schedule",
    "make_schedule",
    "extract",
]
