from .pipeline import (
    prepare_features_nosil,
    train_xvector_model,
    extract_and_score,
    backend_eval,
)

__all__ = [
    "prepare_features_nosil",
    "train_xvector_model",
    "extract_and_score",
    "backend_eval",
]
