from .manifest import Dataset, Utterance, Trial, load_trials, save_trials
from .sampler import ChunkSampler, ChunkBatch
from .synthetic import make_synthetic_corpus, SyntheticCorpus

__all__ = [
    "Dataset",
    "Utterance",
    "Trial",
    "load_trials",
    "save_trials",
    "ChunkSampler",
    "ChunkBatch",
    "make_synthetic_corpus",
    "SyntheticCorpus",
]
