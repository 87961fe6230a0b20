from .kaldi_io import (
    ArkWriter,
    iter_int_vector_ark,
    read_ali_ark,
    read_ali_dir,
    read_feats_scp,
    read_int_vector,
    read_matrix,
    read_scp,
    read_vector,
)

__all__ = [
    "ArkWriter",
    "iter_int_vector_ark",
    "read_ali_ark",
    "read_ali_dir",
    "read_feats_scp",
    "read_int_vector",
    "read_matrix",
    "read_scp",
    "read_vector",
]
