from .framing import num_frames, frame_signal, window_function
from .features import mfcc, fbank, mel_banks, dct_matrix, FeatureExtractor
from .vad import energy_vad, gmm_vad, merge_vads, train_vad_gmms, vad_from_frame_likes
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
    "gmm_vad",
    "merge_vads",
    "train_vad_gmms",
    "vad_from_frame_likes",
    "sliding_cmvn",
    "add_deltas",
    "splice_frames",
    "subsample_frames",
    "paste_features",
    "select_voiced_frames",
    "select_voiced_counts",
]
