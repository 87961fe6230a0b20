from .pipeline import (
    prepare_features_nosil,
    train_xvector_model,
    extract_and_score,
    backend_eval,
    heldout_split,
)
from .drivers import RunResult, run_v1, run_v2, run_v3, run_v4, run_v5

__all__ = [
    "prepare_features_nosil",
    "train_xvector_model",
    "extract_and_score",
    "backend_eval",
    "heldout_split",
    "RunResult",
    "run_v1",
    "run_v2",
    "run_v3",
    "run_v4",
    "run_v5",
]
