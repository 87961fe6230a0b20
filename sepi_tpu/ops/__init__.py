from .framing import num_frames, frame_signal, window_function
from .features import mfcc, fbank, mel_banks, dct_matrix, FeatureExtractor
from .vad import energy_vad
from .cmvn import sliding_cmvn
from .deltas import add_deltas, splice_frames, subsample_frames, paste_features
from .select import select_voiced_frames, select_voiced_counts

__all__ = [
    "num_frames",
    "frame_signal",
    "window_function",
    "mfcc",
    "fbank",
    "mel_banks",
    "dct_matrix",
    "FeatureExtractor",
    "energy_vad",
    "sliding_cmvn",
    "add_deltas",
    "splice_frames",
    "subsample_frames",
    "paste_features",
    "select_voiced_frames",
    "select_voiced_counts",
]
