from .manifest import Dataset, Utterance, Trial, load_trials, save_trials
from .sampler import ChunkSampler, ChunkBatch
from .synthetic import make_synthetic_corpus, SyntheticCorpus, make_phonetic_corpus, PhoneticCorpus
from .audio import AudioStore, extract_segments, read_audio, read_wav, write_wav
from .corpora import (
    dataset_from_table,
    dataset_from_wav_tree,
    dataset_from_kaldi_dir,
    write_kaldi_dir,
)

__all__ = [
    "Dataset",
    "Utterance",
    "Trial",
    "load_trials",
    "save_trials",
    "ChunkSampler",
    "ChunkBatch",
    "make_synthetic_corpus",
    "make_phonetic_corpus",
    "PhoneticCorpus",
    "SyntheticCorpus",
    "AudioStore",
    "extract_segments",
    "read_audio",
    "read_wav",
    "write_wav",
    "dataset_from_table",
    "dataset_from_wav_tree",
    "dataset_from_kaldi_dir",
    "write_kaldi_dir",
]
