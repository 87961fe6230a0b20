from .kaldi_io import ArkWriter, read_scp, read_matrix, read_int_vector, read_vector

__all__ = ["ArkWriter", "read_scp", "read_matrix", "read_int_vector", "read_vector"]
