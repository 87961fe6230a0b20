from .mono import (
    Lexicon,
    MonoAligner,
    align_corpus,
    train_mono_aligner,
)

__all__ = ["Lexicon", "MonoAligner", "align_corpus", "train_mono_aligner"]
