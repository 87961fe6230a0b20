from .vector import length_normalize, subtract_global_mean
from .lda import LdaTransform, compute_lda
from .plda import Plda, train_plda, plda_score_matrix, adapt_plda
from .device import (
    compute_lda_device,
    length_normalize_device,
    plda_score_matrix_device,
    plda_score_matrix_sharded,
    train_plda_device,
)
from .fusion import linear_fusion
from .normalize import s_norm, t_norm, z_norm

__all__ = [
    "length_normalize",
    "subtract_global_mean",
    "LdaTransform",
    "compute_lda",
    "Plda",
    "train_plda",
    "plda_score_matrix",
    "adapt_plda",
    "compute_lda_device",
    "length_normalize_device",
    "plda_score_matrix_device",
    "plda_score_matrix_sharded",
    "train_plda_device",
    "linear_fusion",
    "s_norm",
    "t_norm",
    "z_norm",
]
