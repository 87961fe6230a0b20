from .gmm import DiagGmm, FullGmm, train_diag_ubm, train_full_ubm, diag_to_full
from .ivector import IvectorExtractor, train_ivector_extractor, extract_ivectors

__all__ = [
    "DiagGmm",
    "FullGmm",
    "train_diag_ubm",
    "train_full_ubm",
    "diag_to_full",
    "IvectorExtractor",
    "train_ivector_extractor",
    "extract_ivectors",
]
