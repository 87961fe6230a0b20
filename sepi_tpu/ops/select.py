"""Voiced-frame selection (select-voiced-frames / select-voiced-ali).

Replaces Kaldi `select-voiced-frames` and this repo's custom C++
`src/ivectorbin/select-voiced-ali.cc:27-101` (filter per-frame alignments
by a 0/1 VAD vector so labels stay synchronized with silence-stripped
features — core loop at lines 58-91).

TPU design: on accelerators "deleting rows" is a stable compaction, not a
copy loop.  We sort frame indices by (not-voiced) with a stable argsort so
voiced frames keep their order at the front, then gather.  The output
keeps the static T capacity with a fresh validity mask of length
``sum(voiced)`` — downstream consumers (CMVN windows, chunk samplers,
stats pooling) all honor masks, so no dynamic shapes ever reach XLA.

The same permutation applies to any aligned per-frame stream (features,
senone alignments, speaker labels), which is exactly the invariant
select-voiced-ali.cc enforces with its len(ali)==len(vad) assertion.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def _compaction_perm(voiced: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T) bool -> (perm (B, T) int32, counts (B,) int32)."""
    key = jnp.where(voiced, 0, 1).astype(jnp.int32)
    perm = jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)
    counts = jnp.sum(voiced.astype(jnp.int32), axis=-1)
    return perm, counts


@jax.jit
def select_voiced_frames(
    feats: jnp.ndarray, voiced: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact voiced frames to the front.

    Args:
      feats: (B, T, D) or (T, D).
      voiced: matching (B, T) / (T,) bool (False on padding too).
    Returns:
      (compacted feats, new frame mask) — same shapes, mask true on the
      first ``sum(voiced)`` rows.
    """
    squeeze = feats.ndim == 2
    if squeeze:
        feats, voiced = feats[None], voiced[None]
    perm, counts = _compaction_perm(voiced)
    out = jnp.take_along_axis(feats, perm[..., None], axis=1)
    t = feats.shape[1]
    mask = jnp.arange(t)[None, :] < counts[:, None]
    out = out * mask[..., None]
    if squeeze:
        return out[0], mask[0]
    return out, mask


@jax.jit
def select_voiced_counts(
    values: jnp.ndarray, voiced: jnp.ndarray, fill_value: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """select-voiced-ali: compact an int per-frame stream (alignments,
    labels) by the same permutation.  (B, T) or (T,) int32."""
    squeeze = values.ndim == 1
    if squeeze:
        values, voiced = values[None], voiced[None]
    perm, counts = _compaction_perm(voiced)
    out = jnp.take_along_axis(values, perm, axis=1)
    t = values.shape[1]
    mask = jnp.arange(t)[None, :] < counts[:, None]
    out = jnp.where(mask, out, fill_value)
    if squeeze:
        return out[0], mask[0]
    return out, mask
