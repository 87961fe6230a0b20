"""ctypes bindings for the native NIST SPHERE (.sph) reader.

The shared library (native/sphere.cc) is built on first use, matching
the kaldi_io binding pattern.  This is the framework's `sph2pipe`
equivalent: LDC corpora (SRE/SWBD/Fisher) ship 2-channel SPHERE audio,
most of it shorten-compressed; the reference resolves it through
wav.scp command pipes (`sph2pipe -f wav -p -c N ... |`,
local/make_sre.pl) — here it is one native call.

    samples, rate = read_sph("/ldc/sre04/xyz.sph", channel=1)

Samples are float32 at int16 scale (the framework's audio convention,
sepi_tpu/data/audio.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "sphere.cc"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libsphere.so"))
_lock = threading.Lock()
_lib = None

_ERRORS = {
    -1: "cannot open file",
    -2: "bad SPHERE header",
    -3: "unsupported sample coding",
    -4: "truncated payload",
    -5: "bad channel selector",
    -6: "bad shorten stream",
    -7: "out of memory decoding samples",
}


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
        lib.sph_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_char_p,
            ctypes.c_long,
        ]
        lib.sph_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.sph_free.argtypes = [ctypes.POINTER(ctypes.c_int16)]
        _lib = lib
        return lib


def sph_info(path: str) -> Tuple[int, int, int, str]:
    """(sample_rate, channels, samples_per_channel, coding) of a .sph file."""
    lib = _load()
    rate = ctypes.c_long()
    ch = ctypes.c_long()
    n = ctypes.c_long()
    coding = ctypes.create_string_buffer(128)
    rc = lib.sph_info(path.encode(), ctypes.byref(rate), ctypes.byref(ch),
                      ctypes.byref(n), coding, 128)
    if rc != 0:
        raise ValueError(f"{path}: {_ERRORS.get(rc, rc)}")
    return rate.value, ch.value, n.value, coding.value.decode()


def read_sph(path: str, channel: int = 1) -> Tuple[np.ndarray, int]:
    """Decode one channel of a SPHERE file -> (float32 @ int16 scale, rate).

    ``channel`` is 1-based (the LDC/sph2pipe `-c` convention); 0 returns
    all channels interleaved.
    """
    lib = _load()
    out = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_long()
    rc = lib.sph_read(path.encode(), channel, ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise ValueError(f"{path}: {_ERRORS.get(rc, rc)}")
    try:
        x = np.ctypeslib.as_array(out, shape=(n.value,)).astype(np.float32)
    finally:
        lib.sph_free(out)
    rate, _, _, _ = sph_info(path)
    return x, rate
