"""Data layer.

The reference imports ``m_diffuser.datasets.{sequence,normalization}`` from
four places but the package is missing from its tree (SURVEY.md 'critical
caveat'); this implementation is designed from the call-site interface:
SequenceDataset(dataset_name, horizon, normalizer, max_path_length,
use_padding) + create_dataloader + DatasetNormalizer
(reference train.py:370-381, evaluate.py:165-171, policies.py:503-508).
"""

from dadiff_tpu.datasets.normalization import (
    DatasetNormalizer,
    GaussianNormalizer,
    LimitsNormalizer,
)
from dadiff_tpu.datasets.sequence import SequenceDataset, create_dataloader

__all__ = [
    "DatasetNormalizer",
    "GaussianNormalizer",
    "LimitsNormalizer",
    "SequenceDataset",
    "create_dataloader",
]
