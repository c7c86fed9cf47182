"""Guided diffusion policies (reference: m_diffuser/guides/__init__.py)."""

from dadiff_tpu.guides.policies import (
    GuidedPolicy,
    MPCPolicy,
    ValueGuidedPolicy,
    DynamicsAwarePolicy,
)
from dadiff_tpu.guides.sampling import (
    Conditions,
    ProjectionSpec,
    make_sampler,
    conditions_for_initial_obs,
)

__all__ = [
    "GuidedPolicy",
    "MPCPolicy",
    "ValueGuidedPolicy",
    "DynamicsAwarePolicy",
    "Conditions",
    "ProjectionSpec",
    "make_sampler",
    "conditions_for_initial_obs",
]
