"""Model definitions (reference: m_diffuser/models/__init__.py)."""

from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.models.temporal_transformer import TemporalTransformer
from dadiff_tpu.models.diffusion import GaussianDiffusion

__all__ = ["TemporalUnet", "TemporalTransformer", "GaussianDiffusion"]
