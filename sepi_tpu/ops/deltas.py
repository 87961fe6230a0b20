"""Delta features and frame splicing.

Replaces Kaldi `add-deltas` (used by the v1 i-vector front,
`sid/train_diag_ubm.sh` pipelines: `add-deltas ... | apply-cmvn-sliding`)
and `splice-feats`.

Kaldi delta computation (feat/feature-functions.cc, DeltaFeatures):
order-k deltas are built by repeatedly convolving with the linear-slope
kernel [-w..w]/sum(i^2); edges clamp to the first/last valid frame.
Defaults: order=2, window=2.

TPU design: the clamped-edge gather is expressed per-frame with indices
clipped against the *true* length so a padded batch shares one program;
the filter itself is a tiny einsum over a static (2w+1) tap dimension.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def delta_filter(window: int) -> np.ndarray:
    i = np.arange(-window, window + 1, dtype=np.float64)
    return (i / np.sum(i * i)).astype(np.float32)


@partial(jax.jit, static_argnames=("order", "window"))
def add_deltas(
    feats: jnp.ndarray,
    frame_mask: jnp.ndarray,
    order: int = 2,
    window: int = 2,
) -> jnp.ndarray:
    """(B, T, D) or (T, D) -> same with D*(order+1) columns [x, dx, ddx...]."""
    squeeze = feats.ndim == 2
    if squeeze:
        feats, frame_mask = feats[None], frame_mask[None]
    b, t, d = feats.shape
    n_valid = jnp.sum(frame_mask.astype(jnp.int32), axis=1)  # (B,)
    taps = jnp.asarray(delta_filter(window))  # (2w+1,)
    offs = jnp.arange(-window, window + 1, dtype=jnp.int32)  # (2w+1,)
    tt = jnp.arange(t, dtype=jnp.int32)

    # Clamp indices to [0, n_valid-1] per utterance (edge repetition).
    idx = tt[None, :, None] + offs[None, None, :]  # (1, T, 2w+1)
    idx = jnp.clip(idx, 0, jnp.maximum(n_valid - 1, 0)[:, None, None])  # (B,T,2w+1)

    outs = [feats]
    cur = feats
    for _ in range(order):
        # gather neighbors: (B, T, 2w+1, D)
        neigh = jnp.take_along_axis(
            cur[:, :, None, :], jnp.broadcast_to(idx[..., None], idx.shape + (d,)), axis=1
        )
        cur = jnp.einsum("btwd,w->btd", neigh, taps)
        outs.append(cur)
    out = jnp.concatenate(outs, axis=-1) * frame_mask[..., None]
    return out[0] if squeeze else out


def subsample_frames(feats: jnp.ndarray, every_n: int, offset: int = 0) -> jnp.ndarray:
    """Kaldi subsample-feats: keep every n-th frame ((B,)T,D)."""
    return feats[..., offset::every_n, :]


def paste_features(parts: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Kaldi paste-feats: concatenate feature streams along the feature
    axis (frame counts must already agree, as paste-feats requires —
    used by the DNN/i-vector recipe to join 20d sid + 40d hires streams,
    `init_full_ubm_from_dnn.sh:100-105`)."""
    t0 = parts[0].shape[-2]
    for p in parts[1:]:
        if p.shape[-2] != t0:
            raise ValueError(
                f"paste_features: frame counts differ ({t0} vs {p.shape[-2]})"
            )
    return jnp.concatenate(parts, axis=-1)


@partial(jax.jit, static_argnames=("context",))
def splice_frames(
    feats: jnp.ndarray,
    frame_mask: jnp.ndarray,
    context: Tuple[int, ...] = (-2, -1, 0, 1, 2),
) -> jnp.ndarray:
    """Kaldi splice-feats / xconfig `Append(x@c...)`: concat shifted copies,
    clamping at utterance edges.  (B, T, D) -> (B, T, D*len(context))."""
    squeeze = feats.ndim == 2
    if squeeze:
        feats, frame_mask = feats[None], frame_mask[None]
    b, t, d = feats.shape
    n_valid = jnp.sum(frame_mask.astype(jnp.int32), axis=1)
    tt = jnp.arange(t, dtype=jnp.int32)
    pieces = []
    for c in context:
        idx = jnp.clip(tt[None, :] + c, 0, jnp.maximum(n_valid - 1, 0)[:, None])
        pieces.append(jnp.take_along_axis(feats, idx[..., None], axis=1))
    out = jnp.concatenate(pieces, axis=-1) * frame_mask[..., None]
    return out[0] if squeeze else out
