"""MFCC / log-mel filterbank extraction as a GEMM-native TPU program.

Replaces Kaldi `compute-mfcc-feats` / `compute-fbank-feats`
(`steps/make_mfcc.sh:107`) with Kaldi-compatible numerics, but the compute
is re-shaped for the MXU: instead of a per-frame FFT, the real DFT is one
matmul of the windowed frames against a precomputed (flen, 2K) cos/-sin
basis, followed by |.|^2 and a second matmul against the mel bank — i.e.
the whole spectral frontend is two GEMMs + elementwise, which XLA fuses
and tiles onto the systolic array (cf. the GEMM-native NDFT frontend idea,
PAPERS.md "MelT").  Frame counts are tiny relative to MXU capacity, so the
frontend is effectively free next to the TDNN.

Kaldi conventions preserved (so features are interchangeable with the
reference recipes):
- HTK/Kaldi mel scale 1127*ln(1+f/700); triangular banks between
  low_freq/high_freq with (num_bins+1) intervals.
- DCT-II with orthogonal normalization; cepstral liftering
  1 + 0.5*Q*sin(pi*k/Q).
- use_energy: C0 replaced by raw-frame log energy (MfccOptions default,
  which the SRE configs rely on for the energy VAD).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrontendConfig
from .framing import frame_signal, num_frames

_EPS = float(np.finfo(np.float32).tiny)


def mel_scale(freq):
    return 1127.0 * np.log1p(np.asarray(freq, dtype=np.float64) / 700.0)


def mel_banks(cfg: FrontendConfig) -> np.ndarray:
    """(num_fft_bins, num_mel_bins) triangular mel weights, Kaldi-style."""
    nfft = cfg.padded_window_size
    num_fft_bins = nfft // 2 + 1
    fft_bin_width = cfg.sample_rate / nfft
    low, high = cfg.low_freq, cfg.high_freq_hz
    if not (0.0 <= low < high <= cfg.nyquist):
        raise ValueError(f"bad mel range [{low}, {high}] for fs={cfg.sample_rate}")
    mel_low, mel_high = mel_scale(low), mel_scale(high)
    delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)
    mel_freqs = mel_scale(np.arange(num_fft_bins) * fft_bin_width)  # (K,)
    left = mel_low + np.arange(cfg.num_mel_bins) * delta  # (M,)
    center = left + delta
    right = center + delta
    m = mel_freqs[:, None]
    up = (m - left[None, :]) / delta
    down = (right[None, :] - m) / delta
    w = np.minimum(up, down)
    w = np.clip(w, 0.0, None)
    return w.astype(np.float32)


def dct_matrix(num_ceps: int, num_bins: int) -> np.ndarray:
    """(num_bins, num_ceps) orthogonal DCT-II basis (Kaldi ComputeDctMatrix)."""
    n = np.arange(num_bins, dtype=np.float64)
    k = np.arange(num_ceps, dtype=np.float64)
    basis = np.cos(math.pi / num_bins * (n[:, None] + 0.5) * k[None, :])
    basis *= math.sqrt(2.0 / num_bins)
    basis[:, 0] = math.sqrt(1.0 / num_bins)
    return basis.astype(np.float32)


def lifter_coeffs(num_ceps: int, q: float) -> np.ndarray:
    if q == 0.0:
        return np.ones(num_ceps, dtype=np.float32)
    k = np.arange(num_ceps, dtype=np.float64)
    return (1.0 + 0.5 * q * np.sin(math.pi * k / q)).astype(np.float32)


def dft_basis(cfg: FrontendConfig) -> np.ndarray:
    """(flen, 2K) real-DFT basis: [cos | -sin] columns for bins 0..K-1.

    Only the first ``frame_length`` rows are needed — the zero padding to
    ``padded_window_size`` contributes nothing — so the GEMM contraction
    dim stays at flen (200 for 8 kHz/25 ms).
    """
    nfft = cfg.padded_window_size
    k_bins = nfft // 2 + 1
    n = np.arange(cfg.frame_length, dtype=np.float64)
    k = np.arange(k_bins, dtype=np.float64)
    ang = 2.0 * math.pi * n[:, None] * k[None, :] / nfft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


def _power_spectrum(windowed: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    """(..., flen) @ (flen, 2K) -> power (..., K). One MXU GEMM."""
    two_k = basis.shape[1]
    k = two_k // 2
    spec = jnp.dot(windowed, basis, preferred_element_type=jnp.float32)
    return spec[..., :k] ** 2 + spec[..., k:] ** 2


def fused_dft_basis(cfg: FrontendConfig) -> np.ndarray:
    """DFT basis with DC-removal, preemphasis, and the window folded in.

    All three frame-processing steps are linear maps of the raw frame, so
    (in f64, exactly) they compose into ONE (flen, 2K) matrix:

        spec = window ⊙ (P (f - mean(f) 1)) @ dft
             = f @ [ (I - 1 1ᵀ/flen)ᵀ Pᵀ diag(w) dft ]

    with P the frame-local preemphasis bidiagonal (P[0,0] uses Kaldi's
    edge rule f[0] -= c*f[0]).  The fused spectral path then runs on raw
    frames — no windowed tensor is ever materialized (saves two
    (B, T, flen) elementwise passes on the extraction hot path).
    """
    flen = cfg.frame_length
    base = dft_basis(cfg).astype(np.float64)
    # window
    from .framing import window_function

    b1 = window_function(cfg).astype(np.float64)[:, None] * base
    # preemphasis: f_pre = P f
    c = cfg.preemphasis
    if c:
        p = np.eye(flen)
        p[0, 0] = 1.0 - c
        idx = np.arange(1, flen)
        p[idx, idx - 1] = -c
        b2 = p.T @ b1
    else:
        b2 = b1
    # dc removal: f - mean(f)*1  ->  B - (1/flen) * 1 (1ᵀ B)
    if cfg.remove_dc_offset:
        col_sums = b2.sum(axis=0)
        b3 = b2 - col_sums[None, :] / flen
    else:
        b3 = b2
    return b3.astype(np.float32)


class FeatureExtractor:
    """Precompiled MFCC/fbank pipeline for a fixed FrontendConfig.

    Usage::

        fe = FeatureExtractor(cfg)
        feats, mask = fe.mfcc(samples, lengths, key)   # (B, T, num_ceps)

    ``spectral_mode``:
    - 'auto' (default): on TPU, raw-energy MFCC (dithered or not) runs
      as ONE fused Pallas kernel (framing+DFT+mel+DCT in VMEM, no
      frames tensor in HBM — mfcc_pallas.py); the rest uses 'slices'.
    - 'slices': the block-row-slices + GEMM fused path (pure XLA).
    - 'conv': framing+DFT as ONE strided convolution (no frames tensor
      materialized) — measured 2.5x SLOWER on v5e (13.9 vs 5.45 ms on
      the 16x100 s bench batch: XLA lowers the stride-80/window-200/
      258-channel conv poorly), kept as a tested alternative for future
      hardware/compilers.
    """

    def __init__(self, cfg: FrontendConfig, spectral_mode: str = "auto"):
        self.cfg = cfg
        self.spectral_mode = spectral_mode
        self._mel = jnp.asarray(mel_banks(cfg))
        self._dft = jnp.asarray(dft_basis(cfg))
        self._fused = jnp.asarray(fused_dft_basis(cfg))
        # conv kernel layout (out_channels=2K, in=1, width=flen)
        self._fused_kernel = jnp.asarray(fused_dft_basis(cfg).T[:, None, :])
        self._dct = jnp.asarray(dct_matrix(cfg.num_ceps, cfg.num_mel_bins))
        self._lifter = jnp.asarray(lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter))

    def _log_mel(self, windowed: jnp.ndarray) -> jnp.ndarray:
        power = _power_spectrum(windowed, self._dft)
        mel = jnp.dot(power, self._mel, preferred_element_type=jnp.float32)
        return jnp.log(jnp.maximum(mel, _EPS))

    def _spectral_conv(self, samples, lengths, max_frames):
        """Fused spectral transform as ONE strided conv + tail patch.

        spec[b, t] = frame(b, t) @ fused_basis, with frame extraction
        expressed as a stride-``shift`` window of the padded signal —
        i.e. conv1d(x_pad, basis) — so XLA lowers framing+DFT together
        onto the MXU and never materializes the frames tensor.  Raw
        energies come from two more strided convs (sum and sum-of-
        squares against a ones kernel).  Frames whose window crosses an
        utterance's true end need the right-edge mirror, which depends on
        the per-utterance length: those few rows are recomputed exactly
        (pre-squaring, since spec is linear in the frame) and patched in
        with branch-free selects, making this path identical to the
        exact framing, not an approximation."""
        cfg = self.cfg
        b, n = samples.shape
        flen, shift = cfg.frame_length, cfg.frame_shift
        pad_l = 0 if cfg.snip_edges else flen // 2 - shift // 2
        need = (max_frames - 1) * shift + flen
        pad_r = max(need - (pad_l + n), 0)
        pieces = []
        if pad_l:
            pieces.append(samples[:, :pad_l][:, ::-1])
        pieces.append(samples)
        if pad_r:
            pieces.append(jnp.zeros((b, pad_r), samples.dtype))
        x_pad = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else samples

        def sconv(x, kern):
            out = jax.lax.conv_general_dilated(
                x[:, None, :], kern, (shift,), [(0, 0)],
                dimension_numbers=("NCH", "OIH", "NCH"),
                preferred_element_type=jnp.float32,
            )
            return out[:, :, :max_frames]

        spec = jnp.swapaxes(sconv(x_pad, self._fused_kernel), 1, 2)  # (B,T,2K)
        ones_k = jnp.ones((1, 1, flen), jnp.float32)
        s1 = sconv(x_pad, ones_k)[:, 0]  # (B, T)
        s2 = sconv(x_pad * x_pad, ones_k)[:, 0]

        # exact right-edge recompute for the ~3 frames crossing length
        from .framing import num_frames as _nf

        n_fix = min(-(-(flen - shift // 2) // shift) + 1, max_frames)

        def tail_exact(s, length, t0):
            tt = t0 + jnp.arange(n_fix, dtype=jnp.int32)[:, None]
            nn = jnp.arange(flen, dtype=jnp.int32)[None, :]
            if cfg.snip_edges:
                idx = tt * shift + nn
            else:
                idx = tt * shift + shift // 2 - flen // 2 + nn
            idx = jnp.where(idx < 0, -idx - 1, idx)
            idx = jnp.where(idx >= length, 2 * length - 1 - idx, idx)
            idx = jnp.where(idx < 0, -idx - 1, idx)
            return s[jnp.clip(idx, 0, length - 1)]  # (n_fix, flen)

        t_u = _nf(lengths, cfg)
        t0 = jnp.clip(t_u - n_fix, 0, max_frames - n_fix)
        exact = jax.vmap(tail_exact)(samples, lengths, t0)  # (B, n_fix, flen)
        exact = jax.lax.optimization_barrier(exact)
        spec_e = jnp.einsum(
            "bnf,fk->bnk", exact, self._fused, preferred_element_type=jnp.float32
        )
        s1_e = jnp.sum(exact, axis=-1)
        s2_e = jnp.sum(exact * exact, axis=-1)
        rel = jnp.arange(max_frames, dtype=jnp.int32)[None, :] - t0[:, None]
        for j in range(n_fix):
            cond = rel == j
            spec = jnp.where(cond[:, :, None], spec_e[:, j][:, None, :], spec)
            s1 = jnp.where(cond, s1_e[:, j][:, None], s1)
            s2 = jnp.where(cond, s2_e[:, j][:, None], s2)

        energy = s2 - s1 * s1 / flen if cfg.remove_dc_offset else s2
        log_e = jnp.log(jnp.maximum(energy, _EPS))
        k = spec.shape[-1] // 2
        power = spec[..., :k] ** 2 + spec[..., k:] ** 2
        mel = jnp.dot(power, self._mel, preferred_element_type=jnp.float32)
        log_mel = jnp.log(jnp.maximum(mel, _EPS))
        mask = jnp.arange(max_frames)[None, :] < t_u[:, None]
        return log_mel, log_e, mask

    def _spectral(self, samples, lengths, max_frames, seeds):
        """(log_mel, log_energy, mask) via the fused or the stepwise path.

        Without dither the dc/preemph/window chain folds into the basis
        (fused_dft_basis) and the whole framing+DFT runs as one strided
        conv ('conv') or block-row slices + GEMM ('slices'); with dither
        (per-frame noise) the stepwise path runs.
        """
        cfg = self.cfg
        if seeds is None and cfg.raw_energy:
            degenerate = cfg.frame_shift > cfg.frame_length
            if self.spectral_mode == "conv" and not degenerate:
                return self._spectral_conv(samples, lengths, max_frames)
            from .framing import raw_frames

            frames, mask = raw_frames(samples, lengths, cfg, max_frames)
            s1 = jnp.sum(frames, axis=-1)
            s2 = jnp.sum(frames * frames, axis=-1)
            energy = s2 - s1 * s1 / cfg.frame_length if cfg.remove_dc_offset else s2
            log_e = jnp.log(jnp.maximum(energy, _EPS))
            power = _power_spectrum(frames, self._fused)
            mel = jnp.dot(power, self._mel, preferred_element_type=jnp.float32)
            log_mel = jnp.log(jnp.maximum(mel, _EPS))
        else:
            windowed, log_e, mask = frame_signal(
                samples, lengths, cfg, max_frames, seeds=seeds)
            log_mel = self._log_mel(windowed)
        return log_mel, log_e, mask

    @partial(jax.jit, static_argnames=("self", "max_frames"))
    def _mfcc_impl(self, samples, lengths, max_frames, seeds):
        cfg = self.cfg
        if self.spectral_mode in ("auto", "pallas"):
            from .mfcc_pallas import mfcc_fused, supported

            on_tpu = jax.default_backend() == "tpu"
            if supported(cfg) and (on_tpu or self.spectral_mode == "pallas"):
                # the fused kernel covers dithered configs too (in-kernel
                # counter-hash RNG, waveform-level Gaussian dither)
                return mfcc_fused(
                    samples, lengths, cfg, max_frames, interpret=not on_tpu,
                    seeds=seeds if cfg.dither != 0.0 else None,
                )
        log_mel, log_e, mask = self._spectral(samples, lengths, max_frames, seeds)
        ceps = jnp.dot(log_mel, self._dct, preferred_element_type=jnp.float32)
        ceps = ceps * self._lifter
        if cfg.use_energy:
            if cfg.energy_floor > 0.0:
                log_e = jnp.maximum(log_e, math.log(cfg.energy_floor))
            ceps = ceps.at[..., 0].set(log_e)
        return ceps * mask[..., None], mask

    @partial(jax.jit, static_argnames=("self", "max_frames"))
    def _fbank_impl(self, samples, lengths, max_frames, seeds):
        cfg = self.cfg
        log_mel, log_e, mask = self._spectral(samples, lengths, max_frames, seeds)
        out = log_mel
        if not cfg.use_log_fbank:
            out = jnp.exp(out)
        return out * mask[..., None], mask

    def _seeds(self, key, utt_seeds, batch):
        """Resolve the dither noise source: per-utterance seeds
        (preferred — features invariant to batching; ops/dither.py) or a
        batch-coupled fallback derived from ``key``."""
        if self.cfg.dither == 0.0:
            return None
        if utt_seeds is not None:
            return jnp.asarray(utt_seeds, jnp.int32)
        if key is not None:
            return jax.random.randint(
                key, (batch,), 0, np.iinfo(np.int32).max, dtype=jnp.int32)
        return None

    # -- public API ---------------------------------------------------

    def mfcc(self, samples, lengths, key=None, max_frames: Optional[int] = None,
             utt_seeds=None):
        samples, lengths, squeeze = _batchify(samples, lengths)
        if max_frames is None:
            max_frames = int(num_frames(samples.shape[1], self.cfg))
        seeds = self._seeds(key, utt_seeds, samples.shape[0])
        feats, mask = self._mfcc_impl(samples, lengths, max_frames, seeds)
        return _unbatch(feats, mask, squeeze)

    def fbank(self, samples, lengths, key=None, max_frames: Optional[int] = None,
              utt_seeds=None):
        samples, lengths, squeeze = _batchify(samples, lengths)
        if max_frames is None:
            max_frames = int(num_frames(samples.shape[1], self.cfg))
        seeds = self._seeds(key, utt_seeds, samples.shape[0])
        feats, mask = self._fbank_impl(samples, lengths, max_frames, seeds)
        return _unbatch(feats, mask, squeeze)


def _batchify(samples, lengths):
    samples = jnp.asarray(samples)
    squeeze = samples.ndim == 1
    if squeeze:
        samples = samples[None, :]
    if lengths is None:
        lengths = jnp.full((samples.shape[0],), samples.shape[1], dtype=jnp.int32)
    else:
        lengths = jnp.atleast_1d(jnp.asarray(lengths, dtype=jnp.int32))
    return samples, lengths, squeeze


def _unbatch(feats, mask, squeeze):
    if squeeze:
        return feats[0], mask[0]
    return feats, mask


def mfcc(samples, lengths=None, cfg: FrontendConfig = FrontendConfig(), key=None):
    """Functional one-shot MFCC (builds the extractor; prefer the class in loops)."""
    return FeatureExtractor(cfg).mfcc(samples, lengths, key)


def fbank(samples, lengths=None, cfg: FrontendConfig = FrontendConfig(), key=None):
    return FeatureExtractor(cfg).fbank(samples, lengths, key)
