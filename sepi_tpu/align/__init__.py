from .mono import (
    Lexicon,
    MonoAligner,
    align_corpus,
    train_mono_aligner,
)
from .tied import TiedAligner, train_tied_aligner

__all__ = [
    "Lexicon",
    "MonoAligner",
    "align_corpus",
    "train_mono_aligner",
    "TiedAligner",
    "train_tied_aligner",
]
