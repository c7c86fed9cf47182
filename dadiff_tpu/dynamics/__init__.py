"""Dynamics subsystem: sysID, projection builder, extractors, registry
(reference: m_diffuser/dynamics/__init__.py)."""

from dadiff_tpu.dynamics.extractor import DynamicsExtractor, get_dynamics_extractor
from dadiff_tpu.dynamics.projection import ProjectionMatrixBuilder
from dadiff_tpu.dynamics.registry import get_dynamics_for_env
from dadiff_tpu.dynamics.data_driven import (
    extract_transitions,
    fit_linear_dynamics,
    identify_dynamics_from_data,
)

__all__ = [
    "DynamicsExtractor",
    "get_dynamics_extractor",
    "ProjectionMatrixBuilder",
    "get_dynamics_for_env",
    "extract_transitions",
    "fit_linear_dynamics",
    "identify_dynamics_from_data",
]
