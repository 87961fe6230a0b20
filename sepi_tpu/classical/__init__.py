from .gmm import (
    DiagGmm,
    FullGmm,
    GmmStats,
    accumulate_stats,
    accumulate_stats_sharded,
    diag_to_full,
    train_diag_ubm,
    train_full_ubm,
)
from .ivector import IvectorExtractor, train_ivector_extractor, extract_ivectors

__all__ = [
    "DiagGmm",
    "FullGmm",
    "train_diag_ubm",
    "train_full_ubm",
    "diag_to_full",
    "GmmStats",
    "accumulate_stats",
    "accumulate_stats_sharded",
    "IvectorExtractor",
    "train_ivector_extractor",
    "extract_ivectors",
]
