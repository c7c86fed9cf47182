"""dadiff_tpu: TPU-native dynamics-aware diffusion planning framework.

A from-scratch JAX/XLA/Flax/Pallas rebuild of the capabilities of
darshangm/dynamics-aware-diffusion (Diffuser-style trajectory planning with
dynamics-aware projection; reference layout: m_diffuser/*), redesigned
TPU-first:

  * the DDPM reverse process is a single jitted ``lax.scan`` (no host sync
    per denoise step),
  * conditioning, classifier guidance, and the dynamics projection are pure
    functions composed into the scan body,
  * planning is batched by construction (``vmap`` over samplers) and shards
    over a ``jax.sharding.Mesh``,
  * environment rollouts can run fully on-device (``dadiff_tpu.envs``).

Public API mirrors the reference package surface (reference
``m_diffuser/__init__.py:10-23``). Imports are lazy so ``import dadiff_tpu``
stays cheap and subpackages with optional deps (gymnasium, torch) only load
on use.
"""

import importlib

__version__ = "0.1.0"

_EXPORTS = {
    "TemporalUnet": "dadiff_tpu.models.temporal_unet",
    "TemporalTransformer": "dadiff_tpu.models.temporal_transformer",
    "GaussianDiffusion": "dadiff_tpu.models.diffusion",
    "SequenceDataset": "dadiff_tpu.datasets.sequence",
    "create_dataloader": "dadiff_tpu.datasets.sequence",
    "DatasetNormalizer": "dadiff_tpu.datasets.normalization",
    "GuidedPolicy": "dadiff_tpu.guides.policies",
    "MPCPolicy": "dadiff_tpu.guides.policies",
    "ValueGuidedPolicy": "dadiff_tpu.guides.policies",
    "DynamicsAwarePolicy": "dadiff_tpu.guides.policies",
    "Trainer": "dadiff_tpu.utils.training",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module 'dadiff_tpu' has no attribute {name!r}")
