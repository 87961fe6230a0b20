"""Audio ingest: WAV files + in-memory stores behind one resolver.

Replaces the reference's wav.scp command-pipeline convention (sph2pipe
shell pipes resolved lazily by Kaldi table I/O — `local/make_sre.pl`).
Pipelines-as-data-sources are replaced by a typed resolver: an
`Utterance.wav` field is either

  - a filesystem path to a PCM WAV ("/data/x.wav"),
  - an in-memory store key ("synth:utt1", "aug:utt1-noise"),
  - or a registered custom scheme ("mystore:key").

Samples are float32 at int16 scale (Kaldi's convention — its feature
configs, e.g. dither=1.0 and the VAD energy threshold, assume it).
"""

from __future__ import annotations

import wave
from typing import Callable, Dict, Mapping, Optional, Tuple

import numpy as np

from .manifest import Dataset


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float32 samples at int16 scale, rate).

    Multi-channel audio is downmixed by taking channel 0 (the recipes
    split telephone channels at manifest level, e.g. `make_sre.pl`)."""
    with wave.open(path, "rb") as w:
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 65536.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) * 256.0
    else:
        raise ValueError(f"{path}: unsupported sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch)[:, 0].copy()
    return x, rate


def read_audio(path: str, channel: int = 1) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV or NIST SPHERE file by extension.

    SPHERE (.sph) covers the LDC corpora the reference ingests through
    `sph2pipe` pipes (local/make_sre.pl); decoding — including
    embedded-shorten payloads — is native (native/sphere.cc).
    ``channel`` is 1-based and only meaningful for SPHERE."""
    if path.lower().endswith(".sph"):
        from ..utils.sphere import read_sph

        return read_sph(path, channel)
    return read_wav(path)


def write_wav(path: str, samples: np.ndarray, rate: int) -> None:
    x = np.round(np.clip(np.asarray(samples), -32768, 32767)).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())


class AudioStore:
    """Resolves Utterance.wav references to sample arrays.

    In-memory pools are registered per scheme; bare paths hit the
    filesystem.  Results are optionally cached (small corpora / tests).
    """

    def __init__(self, cache: bool = False):
        self._schemes: Dict[str, Mapping[str, np.ndarray]] = {}
        self._loaders: Dict[str, Callable[[str], np.ndarray]] = {}
        self._cache: Optional[Dict[str, np.ndarray]] = {} if cache else None

    def register_pool(self, scheme: str, pool: Mapping[str, np.ndarray]) -> None:
        self._schemes[scheme] = pool

    def register_loader(self, scheme: str, fn: Callable[[str], np.ndarray]) -> None:
        self._loaders[scheme] = fn

    def load(self, ref: str, expect_rate: Optional[int] = None,
             channel: int = 1) -> np.ndarray:
        if self._cache is not None and channel == 1 and ref in self._cache:
            return self._cache[ref]
        if ":" in ref and not ref[1:3] == ":\\":
            scheme, key = ref.split(":", 1)
            if scheme in self._schemes:
                x = np.asarray(self._schemes[scheme][key], np.float32)
            elif scheme in self._loaders:
                x = np.asarray(self._loaders[scheme](key), np.float32)
            else:
                raise KeyError(f"unregistered audio scheme {scheme!r} in {ref!r}")
        else:
            x, rate = read_audio(ref, channel)
            if expect_rate is not None and rate != expect_rate:
                raise ValueError(f"{ref}: rate {rate} != expected {expect_rate}")
        if self._cache is not None and channel == 1:
            self._cache[ref] = x
        return x

    def load_utterance(self, u) -> np.ndarray:
        """Resolve one manifest row, honoring its channel/codec meta (the
        LDC walkers mark 2-channel SPHERE sides with ("channel", "2"))."""
        return self.load(
            u.wav, u.sample_rate, channel=int(u.get_meta("channel", "1"))
        )

    def load_dataset(self, dataset: Dataset) -> Dict[str, np.ndarray]:
        return {
            u.utt_id: self.load_utterance(u)
            for u in dataset
            if u.wav is not None
        }


def extract_segments(
    recordings,
    dataset,
    sample_rate: int,
    min_segment_length: float = 0.1,
    max_overshoot: float = 0.5,
    strict: bool = False,
    log=None,
):
    """Crop recording audio into per-utterance segments — the
    `extract-segments` binary's semantics on in-memory arrays.

    Args:
      recordings: recording_id -> (N,) samples (the wav.scp payloads).
      dataset: manifest whose utterances carry (recording, start, end);
        rows without segment info pass through via their own wav/utt id.
      sample_rate: Hz of the recordings.
      min_segment_length: segments shorter than this many seconds are
        skipped with a warning-by-omission (Kaldi --min-segment-length).
      max_overshoot: how far (s) ``end`` may exceed the recording before
        the row is rejected; within tolerance it is clamped
        (Kaldi --max-overshoot).
      strict: when False (default, matching extract-segments), a row
        with a missing recording or over-overshoot end is warned about
        and skipped so one malformed segments row cannot abort the
        corpus load; when True such rows raise.
      log: optional callable for skip warnings (default: print).
    Returns: utt_id -> samples.
    """
    warn = log or print
    out = {}
    skipped = 0
    for u in dataset:
        if u.start is None and u.end is None:
            key = u.recording or u.utt_id
            if key in recordings:
                out[u.utt_id] = recordings[key]
            continue
        rec = u.recording or u.wav
        if rec not in recordings:
            if strict:
                raise KeyError(f"{u.utt_id}: recording {rec!r} not supplied")
            warn(f"extract_segments: skipping {u.utt_id}: recording "
                 f"{rec!r} not supplied")
            skipped += 1
            continue
        x = recordings[rec]
        n = len(x)
        if u.end - u.start < min_segment_length:
            continue
        if u.end * sample_rate > n + max_overshoot * sample_rate:
            msg = (f"{u.utt_id}: segment end {u.end}s overshoots recording "
                   f"({n / sample_rate:.2f}s) beyond max_overshoot")
            if strict:
                raise ValueError(msg)
            warn(f"extract_segments: skipping {msg}")
            skipped += 1
            continue
        i0 = int(round(u.start * sample_rate))
        i1 = min(int(round(u.end * sample_rate)), n)
        if i1 - i0 < int(min_segment_length * sample_rate):
            continue
        out[u.utt_id] = x[i0:i1]
    if skipped:
        warn(f"extract_segments: skipped {skipped} malformed segment rows")
    return out
