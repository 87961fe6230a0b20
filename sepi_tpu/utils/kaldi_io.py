"""ctypes bindings for the native Kaldi ark/scp reader/writer.

The shared library (native/kaldi_io.cc) is built on first use with the
system toolchain and cached next to the source; see that file for the
formats covered.  Usage::

    feats = {key: read_matrix(path, off) for key, (path, off) in read_scp("feats.scp")}
    with ArkWriter("emb.ark", "emb.scp") as w:
        w.put_matrix("utt1", x)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "kaldi_io.cc"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libkaldi_io.so"))
_lock = threading.Lock()
_lib = None


def _build() -> None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.ki_read_matrix.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.ki_read_vector.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.ki_read_int_vector.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ]
        lib.ki_writer_open.restype = ctypes.c_void_p
        lib.ki_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.ki_writer_put_matrix.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.ki_writer_put_compressed_matrix.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.ki_writer_put_vector.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.ki_writer_put_int_vector.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.ki_writer_close.argtypes = [ctypes.c_void_p]
        lib.ki_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def read_scp(path: str) -> Iterator[Tuple[str, Tuple[str, int]]]:
    """Yield (key, (ark_path, offset)) from an scp file."""
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            key, ref = parts[0], parts[1]
            ark, _, off = ref.rpartition(":")
            yield key, (ark, int(off))


def read_matrix(ark_path: str, offset: int) -> np.ndarray:
    lib = _load()
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    data = ctypes.POINTER(ctypes.c_float)()
    rc = lib.ki_read_matrix(
        ark_path.encode(), offset, ctypes.byref(rows), ctypes.byref(cols),
        ctypes.byref(data),
    )
    if rc != 0:
        raise IOError(f"ki_read_matrix({ark_path}:{offset}) failed rc={rc}")
    try:
        out = np.ctypeslib.as_array(data, shape=(rows.value, cols.value)).copy()
    finally:
        lib.ki_free(data)
    return out


def read_vector(ark_path: str, offset: int) -> np.ndarray:
    lib = _load()
    n = ctypes.c_int32()
    data = ctypes.POINTER(ctypes.c_float)()
    rc = lib.ki_read_vector(ark_path.encode(), offset, ctypes.byref(n), ctypes.byref(data))
    if rc != 0:
        raise IOError(f"ki_read_vector({ark_path}:{offset}) failed rc={rc}")
    try:
        out = np.ctypeslib.as_array(data, shape=(n.value,)).copy()
    finally:
        lib.ki_free(data)
    return out


def read_int_vector(ark_path: str, offset: int) -> np.ndarray:
    lib = _load()
    n = ctypes.c_int32()
    data = ctypes.POINTER(ctypes.c_int32)()
    rc = lib.ki_read_int_vector(
        ark_path.encode(), offset, ctypes.byref(n), ctypes.byref(data)
    )
    if rc != 0:
        raise IOError(f"ki_read_int_vector({ark_path}:{offset}) failed rc={rc}")
    try:
        out = np.ctypeslib.as_array(data, shape=(n.value,)).copy()
    finally:
        lib.ki_free(data)
    return out


class ArkWriter:
    """Write float matrices / vectors / int vectors to ark(+scp)."""

    def __init__(self, ark_path: str, scp_path: str = ""):
        self._lib = _load()
        self._w = self._lib.ki_writer_open(ark_path.encode(), scp_path.encode())
        if not self._w:
            raise IOError(f"cannot open {ark_path} / {scp_path}")

    def put_matrix(self, key: str, x: np.ndarray) -> None:
        x = np.ascontiguousarray(x, np.float32)
        rc = self._lib.ki_writer_put_matrix(
            self._w, key.encode(),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[0], x.shape[1],
        )
        if rc:
            raise IOError(f"put_matrix({key}) rc={rc}")

    def put_compressed_matrix(self, key: str, x: np.ndarray) -> None:
        """Write as Kaldi CompressedMatrix (format 1, ~8-bit lossy)."""
        x = np.ascontiguousarray(x, np.float32)
        rc = self._lib.ki_writer_put_compressed_matrix(
            self._w, key.encode(),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[0], x.shape[1],
        )
        if rc:
            raise IOError(f"put_compressed_matrix({key}) rc={rc}")

    def put_vector(self, key: str, x: np.ndarray) -> None:
        x = np.ascontiguousarray(x, np.float32)
        rc = self._lib.ki_writer_put_vector(
            self._w, key.encode(),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[0],
        )
        if rc:
            raise IOError(f"put_vector({key}) rc={rc}")

    def put_int_vector(self, key: str, x: np.ndarray) -> None:
        x = np.ascontiguousarray(x, np.int32)
        rc = self._lib.ki_writer_put_int_vector(
            self._w, key.encode(),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), x.shape[0],
        )
        if rc:
            raise IOError(f"put_int_vector({key}) rc={rc}")

    def close(self) -> None:
        if self._w:
            self._lib.ki_writer_close(self._w)
            self._w = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
