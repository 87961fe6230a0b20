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
        lib.ki_writer_put_compressed_matrix2.argtypes = [
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


def iter_int_vector_ark(fileobj) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, int32 vector) entries of a *streamed* binary ark.

    This is the sequential-reader counterpart of `read_int_vector` for
    archives with no scp (alignment archives are consumed whole, so
    random access buys nothing).  Binary format per entry:
    key ' ' '\\0' 'B' <size byte 4> <int32 count> <raw int32 data>."""
    data = fileobj.read()
    pos, n = 0, len(data)
    while pos < n:
        sp = data.find(b" ", pos)
        if sp < 0:
            if data[pos:].strip():
                raise ValueError("trailing garbage in int-vector ark")
            break
        key = data[pos:sp].decode()
        pos = sp + 1
        if data[pos : pos + 2] != b"\x00B":
            raise ValueError(
                f"{key}: not a binary ark entry (text-format archives are "
                "not supported; write with --binary=true)"
            )
        pos += 2
        if data[pos : pos + 1] != b"\x04":
            raise ValueError(f"{key}: expected int32 size byte")
        pos += 1
        cnt = int(np.frombuffer(data, "<i4", 1, pos)[0])
        pos += 4
        if cnt < 0 or pos + 4 * cnt > n:
            raise ValueError(f"{key}: corrupt count {cnt}")
        yield key, np.frombuffer(data, "<i4", cnt, pos).copy()
        pos += 4 * cnt


def read_ali_ark(path: str) -> dict:
    """Read one alignment archive — gzipped (`ali.1.gz`, the on-disk form
    `steps/align_fmllr.sh` ships) or plain — into {utt: (T,) int32}."""
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return dict(iter_int_vector_ark(f))


def read_feats_scp(scp_path: str) -> dict:
    """Materialize a Kaldi feats.scp into {utt: (T, D) float32} — any mix
    of FM/DM/CM/CM2/CM3 entries (the real-world artifact forms)."""
    return {key: read_matrix(path, off) for key, (path, off) in read_scp(scp_path)}


def read_ali_dir(ali_dir: str, pattern: str = "ali.*.gz") -> dict:
    """Ingest a Kaldi alignment directory (the `exp/tri6a_4k_ali` analog):
    merge every ali.N.gz job shard into one {utt: labels} mapping."""
    import glob

    paths = sorted(glob.glob(os.path.join(ali_dir, pattern)))
    if not paths:
        raise FileNotFoundError(f"no {pattern} under {ali_dir}")
    out: dict = {}
    for p in paths:
        out.update(read_ali_ark(p))
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

    def put_compressed_matrix2(self, key: str, x: np.ndarray) -> None:
        """Write as Kaldi CompressedMatrix format 2 (uint16/element,
        global linear quantization — kTwoByte)."""
        x = np.ascontiguousarray(x, np.float32)
        rc = self._lib.ki_writer_put_compressed_matrix2(
            self._w, key.encode(),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[0], x.shape[1],
        )
        if rc:
            raise IOError(f"put_compressed_matrix2({key}) rc={rc}")

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
