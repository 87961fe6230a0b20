from .pipeline import (
    prepare_features_nosil,
    prepare_features_phonetic,
    train_xvector_model,
    extract_and_score,
    backend_eval,
    heldout_split,
)
from .drivers import RunResult, run_v1, run_v2, run_v3, run_v4, run_v5
from .s5 import S5Result, run_s5, select_voiced_ali

__all__ = [
    "prepare_features_nosil",
    "prepare_features_phonetic",
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
    "S5Result",
    "run_s5",
    "select_voiced_ali",
]
