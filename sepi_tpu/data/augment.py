"""Data augmentation: reverberation and SNR-controlled noise mixing.

Replaces the reference's augmentation stage (`v2/run_sre10.sh:92-159`):
`steps/data/reverberate_data_dir.py` (RIR convolution via the
`wav-reverberate` binary) and `steps/data/augment_data_dir_new.py`
(MUSAN noise/music/babble mixing), including the dataset-level semantics:
augmented copies get suffixed utt ids with a ``uniq_id`` back-pointer
(utt2uniq) so train/valid splits never leak a speaker's clean copy into
the other side.

TPU design: convolution/mixing are jitted FFT ops over sample batches;
the corpus-level `augment_dataset` is a manifest transform that pairs
each utterance with a deterministic per-utterance augmentation plan
(seeded like the reference's random pipelines).

Semantics matched to wav-reverberate / augment_data_dir:
- reverb: full convolution with the RIR, trimmed to the input length and
  *power-normalized* to the input's energy (wav-reverberate default
  behaviour keeps levels comparable);
- additive noise at target SNR: noise cropped/tiled to length, scaled so
  10*log10(P_signal/P_noise) == snr;
- babble: 3-7 noise sources summed before mixing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .manifest import Dataset, Utterance


def _power(x: np.ndarray) -> float:
    return float(np.mean(np.square(x, dtype=np.float64))) + 1e-20


@partial(jax.jit, static_argnames=("out_len",))
def _fft_convolve(signal: jnp.ndarray, rir: jnp.ndarray, out_len: int) -> jnp.ndarray:
    n = signal.shape[0] + rir.shape[0] - 1
    nfft = 1 << (n - 1).bit_length()
    out = jnp.fft.irfft(
        jnp.fft.rfft(signal, nfft) * jnp.fft.rfft(rir, nfft), nfft
    )
    return out[:out_len]


def reverberate(samples: np.ndarray, rir: np.ndarray) -> np.ndarray:
    """Convolve with an RIR; aligned to the RIR's direct path (peak) and
    power-normalized to the dry signal (wav-reverberate --shift-output)."""
    rir = np.asarray(rir, np.float32)
    peak = int(np.argmax(np.abs(rir)))
    wet = np.asarray(
        _fft_convolve(jnp.asarray(samples, jnp.float32), jnp.asarray(rir),
                      len(samples) + peak)
    )[peak : peak + len(samples)]
    scale = np.sqrt(_power(samples) / _power(wet))
    return (wet * scale).astype(np.float32)


def _fit_noise(noise: np.ndarray, length: int, rng: np.random.Generator) -> np.ndarray:
    """Crop (random offset) or tile noise to the target length."""
    if len(noise) >= length:
        off = int(rng.integers(len(noise) - length + 1))
        return np.asarray(noise[off : off + length], np.float32)
    reps = -(-length // len(noise))
    return np.tile(np.asarray(noise, np.float32), reps)[:length]


def mix_noise(
    samples: np.ndarray,
    noise: np.ndarray,
    snr_db: float,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Additive mixing at an exact target SNR."""
    rng = rng or np.random.default_rng(0)
    n = _fit_noise(noise, len(samples), rng)
    scale = np.sqrt(_power(samples) / (_power(n) * 10.0 ** (snr_db / 10.0)))
    return (np.asarray(samples, np.float32) + scale * n).astype(np.float32)


def mix_babble(
    samples: np.ndarray,
    speech_sources: Sequence[np.ndarray],
    snr_db: float,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Babble: sum several speech sources, then mix at target SNR
    (augment_data_dir's 3-7 speaker babble)."""
    rng = rng or np.random.default_rng(0)
    acc = np.zeros(len(samples), np.float32)
    for src in speech_sources:
        acc += _fit_noise(src, len(samples), rng)
    return mix_noise(samples, acc, snr_db, rng)


@dataclasses.dataclass(frozen=True)
class AugmentSpec:
    """One augmentation kind with its SNR ladder (reference values:
    noise 0:5:10:15, music 5:8:10:15, babble 13:15:17:20)."""

    kind: str  # reverb | noise | music | babble
    snrs: Tuple[float, ...] = ()


REFERENCE_AUGMENTS = (
    AugmentSpec("reverb"),
    AugmentSpec("noise", (0.0, 5.0, 10.0, 15.0)),
    AugmentSpec("music", (5.0, 8.0, 10.0, 15.0)),
    AugmentSpec("babble", (13.0, 15.0, 17.0, 20.0)),
)


def augment_dataset(
    dataset: Dataset,
    audio: Mapping[str, np.ndarray],
    rirs: Sequence[np.ndarray] = (),
    noises: Mapping[str, Sequence[np.ndarray]] = {},
    specs: Sequence[AugmentSpec] = REFERENCE_AUGMENTS,
    seed: int = 0,
) -> Tuple[Dataset, Dict[str, np.ndarray]]:
    """Create one augmented copy per utterance per applicable spec.

    ``noises`` maps kind ('noise'/'music'/'babble') to sample pools.
    Returns (augmented-only dataset, augmented audio).  Combine with the
    clean set via ``dataset.combine`` like `run_sre10.sh:155-159`.
    """
    rng = np.random.default_rng(seed)
    new_utts: List[Utterance] = []
    new_audio: Dict[str, np.ndarray] = {}
    for utt in dataset:
        x = audio[utt.utt_id]
        for spec in specs:
            if spec.kind == "reverb":
                if not len(rirs):
                    continue
                rir = rirs[int(rng.integers(len(rirs)))]
                y = reverberate(x, rir)
            else:
                pool = noises.get(spec.kind)
                if not pool:
                    continue
                snr = float(spec.snrs[int(rng.integers(len(spec.snrs)))])
                if spec.kind == "babble":
                    k = int(rng.integers(3, 8))
                    srcs = [pool[int(rng.integers(len(pool)))] for _ in range(k)]
                    y = mix_babble(x, srcs, snr, rng)
                else:
                    noise = pool[int(rng.integers(len(pool)))]
                    y = mix_noise(x, noise, snr, rng)
            aug_id = f"{utt.utt_id}-{spec.kind}"
            new_audio[aug_id] = y
            new_utts.append(
                utt.replace(
                    utt_id=aug_id,
                    wav=f"aug:{aug_id}",
                    uniq_id=utt.uniq_id or utt.utt_id,
                )
            )
    return Dataset(new_utts, f"{dataset.name}_aug"), new_audio


def synthetic_rir(
    sample_rate: int = 8000,
    rt60: float = 0.3,
    length: float = 0.25,
    direct_delay: float = 0.01,
    seed: int = 0,
) -> np.ndarray:
    """Exponentially-decaying noise RIR (for tests / RIRS_NOISES-free runs)."""
    rng = np.random.default_rng(seed)
    n = int(length * sample_rate)
    t = np.arange(n) / sample_rate
    tail = rng.standard_normal(n) * np.exp(-6.9 * t / rt60)
    d = int(direct_delay * sample_rate)
    rir = 0.3 * tail
    rir[d] += 1.0
    return rir.astype(np.float32)
