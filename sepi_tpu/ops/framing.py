"""Signal framing with Kaldi frame-extraction semantics, batched for TPU.

Replaces the framing stage of `compute-mfcc-feats` / `compute-fbank-feats`
(reference call sites: `steps/make_mfcc.sh:107`).  Semantics covered:

- ``snip_edges=True``:  frames = (N - flen) // shift + 1, frame t starts at
  t*shift (first-sample-aligned).
- ``snip_edges=False`` (the SRE configs' choice, `v2/conf/mfcc.conf`):
  frames = (N + shift//2) // shift, frame t is *centered* at
  t*shift + shift//2, out-of-range samples mirror-reflected (without edge
  repetition) — this keeps frame counts aligned with Kaldi alignments,
  which v3 depends on (`v3/run_sre10.sh:60-64`).
- dither, DC-offset removal, raw log-energy, preemphasis, window multiply,
  in Kaldi's order (dither -> dc -> [energy] -> preemph -> window).

TPU design notes: everything is a static-shape gather + elementwise chain
over a (B, N) sample batch; per-utterance true lengths enter only through
the reflection index computation and the frame validity mask, so one
compiled program serves a whole padded batch.  The gather feeds a GEMM
frontend (see features.py), keeping the whole frontend on MXU/VPU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrontendConfig


def num_frames(num_samples, cfg: FrontendConfig):
    """Frame count for a given sample count (host or traced ints)."""
    flen, shift = cfg.frame_length, cfg.frame_shift
    if cfg.snip_edges:
        if isinstance(num_samples, (int, np.integer)):
            return max((num_samples - flen) // shift + 1, 0) if num_samples >= flen else 0
        n = (num_samples - flen) // shift + 1
        return jnp.maximum(jnp.where(num_samples >= flen, n, 0), 0)
    else:
        return (num_samples + shift // 2) // shift


def window_function(cfg: FrontendConfig) -> np.ndarray:
    """Kaldi window shapes; 'povey' is hamming-like raised to 0.85."""
    m = cfg.frame_length
    a = 2.0 * math.pi / (m - 1)
    n = np.arange(m, dtype=np.float64)
    if cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * n)
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * n)
    elif cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * n)) ** 0.85
    elif cfg.window_type == "rectangular":
        w = np.ones(m)
    else:
        raise ValueError(f"unknown window type {cfg.window_type!r}")
    return w.astype(np.float32)


def _frame_indices(max_frames: int, length, cfg: FrontendConfig) -> jnp.ndarray:
    """(T, flen) int32 sample indices for each frame, mirror-reflected
    against the *true* utterance length (dynamic) when snip_edges=False."""
    flen, shift = cfg.frame_length, cfg.frame_shift
    t = jnp.arange(max_frames, dtype=jnp.int32)[:, None]
    n = jnp.arange(flen, dtype=jnp.int32)[None, :]
    if cfg.snip_edges:
        idx = t * shift + n
        # Frames past the valid region are masked later; clamp for safety.
        return jnp.clip(idx, 0, length - 1)
    start = t * shift + shift // 2 - flen // 2
    idx = start + n
    # Mirror without repeating the edge sample (Kaldi convention):
    # i < 0 -> -i - 1 ; i >= L -> 2L - 1 - i.  Apply twice to cover
    # pathological short utterances, then clamp.
    idx = jnp.where(idx < 0, -idx - 1, idx)
    idx = jnp.where(idx >= length, 2 * length - 1 - idx, idx)
    idx = jnp.where(idx < 0, -idx - 1, idx)
    return jnp.clip(idx, 0, length - 1)


def _process_frames(
    frames: jnp.ndarray,
    cfg: FrontendConfig,
    key: Optional[jax.Array],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """dither -> remove DC -> raw energy -> preemphasis -> window.

    frames: (T, flen) float32.  Returns (windowed (T, flen), log_energy (T,)).
    """
    if cfg.dither != 0.0 and key is not None:
        frames = frames + cfg.dither * jax.random.normal(key, frames.shape, frames.dtype)
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    eps = jnp.finfo(jnp.float32).tiny
    log_energy = jnp.log(jnp.maximum(jnp.sum(frames * frames, axis=-1), eps))
    if cfg.preemphasis != 0.0:
        shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
        frames = frames - cfg.preemphasis * shifted
    frames = frames * jnp.asarray(window_function(cfg))
    if not cfg.raw_energy:
        log_energy = jnp.log(jnp.maximum(jnp.sum(frames * frames, axis=-1), eps))
    return frames, log_energy


def _gather_frames_exact(samples, lengths, cfg, max_frames):
    """Reference framing: per-frame index gather with full reflection.

    Exact but gather-heavy (B*T*flen scalar loads) — used for small
    inputs, for the tail fix-up of the fast path, and as the golden
    oracle in tests."""

    def one(s, length):
        return s[_frame_indices(max_frames, length, cfg)]

    return jax.vmap(one)(samples, lengths)


def _gather_frames_fast(samples, lengths, cfg, max_frames):
    """Gather-free framing for the TPU hot path.

    TPU gathers run on the scalar core and dominate the frontend (374 ms
    for 16x100 s of audio, vs ~2 ms for the entire rest of the MFCC).
    But frame_shift and frame_length share a large gcd g (40 at
    8 kHz/25 ms/10 ms), so every frame is a concatenation of K = flen/g
    g-sample blocks at block stride S = shift/g — and block j of every
    frame can be produced for ALL frames at once as a strided
    slice + reshape:  part_j = x_pad[:, j*g : j*g + T*shift]
    .reshape(B, T, shift)[:, :, :g].  Framing becomes K dense slices
    (pure vectorized copies, no index vectors at all).

    Left mirror padding is static (same for every utterance); the right
    boundary depends on each utterance's true length, so the last few
    frames (whose window crosses ``length``) are recomputed with the
    exact gather and patched in — making this path *identical* to the
    exact one, not an approximation.
    """
    b, n = samples.shape
    flen, shift = cfg.frame_length, cfg.frame_shift
    import math as _math

    g = _math.gcd(flen, shift)
    pad_l = 0 if cfg.snip_edges else flen // 2 - shift // 2
    if pad_l < 0:  # degenerate config (shift > frame length)
        return _gather_frames_exact(samples, lengths, cfg, max_frames)
    k_blocks = flen // g

    # left mirror pad (Kaldi convention: index -i-1, i.e. symmetric),
    # right zero pad to g-aligned slice capacity.
    need = (max_frames - 1) * shift + flen
    n_pad = pad_l + n
    pad_r = max(need - n_pad, 0) + flen
    pad_r += (-(n_pad + pad_r)) % g
    pieces = []
    if pad_l:
        pieces.append(samples[:, :pad_l][:, ::-1])
    pieces.append(samples)
    pieces.append(jnp.zeros((b, pad_r), samples.dtype))
    x_pad = jnp.concatenate(pieces, axis=1)

    # View as g-sample block rows; frame t's j-th block is row
    # j + (shift/g)*t — a strided row slice per j (no truncating
    # sub-block slice, which lowers to slower strided copies).
    rows = x_pad.reshape(b, -1, g)
    s_blocks = shift // g
    parts = [
        rows[:, j : j + s_blocks * max_frames : s_blocks] for j in range(k_blocks)
    ]
    frames = jnp.concatenate(parts, axis=-1)

    # Tail fix-up: frames whose window crosses the true end need the
    # mirror; recompute those few exactly and patch them in.  The patch
    # is applied with branch-free selects — a batched
    # dynamic_update_slice would lower to a scatter, which runs on the
    # TPU scalar core and costs ~400 ms on a 16x100 s batch.
    n_fix = min(-(-(flen - shift // 2) // shift) + 1, max_frames)  # ~3

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

    t_u = num_frames(lengths, cfg)  # (B,)
    t0 = jnp.clip(t_u - n_fix, 0, max_frames - n_fix)  # (B,)
    exact = jax.vmap(tail_exact)(samples, lengths, t0)  # (B, n_fix, flen)
    # Barrier: without it XLA fuses this (B, n_fix, flen) gather through
    # the selects below and rematerializes the ENTIRE frames tensor as a
    # per-sample gather (scalar-core, ~50x slower than the slices above).
    exact = jax.lax.optimization_barrier(exact)
    rel = jnp.arange(max_frames, dtype=jnp.int32)[None, :] - t0[:, None]  # (B, T)
    for j in range(n_fix):
        cond = (rel == j)[:, :, None]
        frames = jnp.where(cond, exact[:, j][:, None, :], frames)
    return frames


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def raw_frames(
    samples: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FrontendConfig,
    max_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Framing only (no dither/dc/preemph/window): (B, T, flen) + mask.

    Feeds the fused spectral path where dc-removal/preemphasis/window are
    folded into the DFT basis (features.fused_dft_basis)."""
    samples = samples.astype(jnp.float32)
    if max_frames >= 32:
        frames = _gather_frames_fast(samples, lengths, cfg, max_frames)
    else:
        frames = _gather_frames_exact(samples, lengths, cfg, max_frames)
    nf = num_frames(lengths, cfg)
    mask = jnp.arange(max_frames)[None, :] < nf[:, None]
    return frames, mask


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def frame_signal(
    samples: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FrontendConfig,
    max_frames: int,
    key: Optional[jax.Array] = None,
    seeds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched framing.

    Args:
      samples: (B, N) float32 raw audio (padded).
      lengths: (B,) int32 true sample counts.
      max_frames: static frame capacity (>= num_frames(max length)).
      key: PRNG key for dither (None disables dither).
      seeds: (B,) int32 per-utterance dither seeds (ops/dither.py) —
        preferred over ``key``: the noise becomes a pure function of
        (utt seed, frame index, sample-in-frame), so features are
        invariant to batch composition.

    Returns:
      windowed (B, max_frames, flen), log_energy (B, max_frames),
      frame_mask (B, max_frames) bool.
    """
    samples = samples.astype(jnp.float32)
    b = samples.shape[0]

    if max_frames >= 32:
        frames = _gather_frames_fast(samples, lengths, cfg, max_frames)
    else:
        frames = _gather_frames_exact(samples, lengths, cfg, max_frames)

    if seeds is not None and cfg.dither != 0.0:
        # per-frame counter-hash dither in Kaldi's position (before dc
        # removal inside _process_frames, which then must not re-dither)
        from .dither import hash_normal

        flen = cfg.frame_length
        s = jax.lax.bitcast_convert_type(
            jnp.asarray(seeds, jnp.int32), jnp.uint32)[:, None, None]
        cnt = jnp.arange(max_frames * flen, dtype=jnp.uint32).reshape(
            1, max_frames, flen)
        # fixed span (not max_frames*flen): the second uniform's counter
        # offset must not depend on batch padding, or invariance breaks
        # (2^27 covers 1.9 h of 10 ms frames at flen=200)
        frames = frames + cfg.dither * hash_normal(s, cnt, 1 << 27)
        key = None

    if key is not None:
        keys = jax.random.split(key, b)
        windowed, log_e = jax.vmap(lambda f, k: _process_frames(f, cfg, k))(
            frames, keys
        )
    else:
        windowed, log_e = jax.vmap(lambda f: _process_frames(f, cfg, None))(frames)
    nf = num_frames(lengths, cfg)
    mask = jnp.arange(max_frames)[None, :] < nf[:, None]
    return windowed, log_e, mask
