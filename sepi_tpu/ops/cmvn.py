"""Sliding-window cepstral mean (and variance) normalization.

Replaces Kaldi `apply-cmvn-sliding --norm-vars=false --center=true
--cmn-window=300`, used at every feature-consumption site in the reference
(e.g. `sid/nnet3/xvector/extract_xvectors_new.sh:79`,
`local/nnet3/xvector/prepare_feats_for_egs.sh`).

Kaldi window semantics (feat/feature-functions.cc, SlidingWindowCmn):
with --center, frame t's window is [t - w/2, t - w/2 + w), shifted to stay
inside [0, T); the window is always min(w, T) frames.

TPU design: O(T*D) via an exclusive prefix sum over time and two dynamic
gathers — no per-frame reduction loops.  Padded frames are zeroed, and
window clipping uses each utterance's true frame count, so the op runs
batched under one jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import CmvnConfig


@partial(jax.jit, static_argnames=("cfg",))
def sliding_cmvn(
    feats: jnp.ndarray,
    frame_mask: jnp.ndarray,
    cfg: CmvnConfig = CmvnConfig(),
) -> jnp.ndarray:
    """Batched sliding CMVN.

    Args:
      feats: (B, T, D) or (T, D) float32 (padding rows must be finite).
      frame_mask: (B, T) or (T,) bool.
    Returns:
      normalized feats, zeroed on padding.
    """
    squeeze = feats.ndim == 2
    if squeeze:
        feats, frame_mask = feats[None], frame_mask[None]
    b, t, d = feats.shape
    w = cfg.window
    mask_f = frame_mask.astype(feats.dtype)
    x = feats * mask_f[..., None]
    num_valid = jnp.sum(mask_f, axis=1).astype(jnp.int32)  # (B,)

    # Exclusive prefix sums over time: csum[t] = sum(x[0:t]).
    csum = jnp.concatenate(
        [jnp.zeros((b, 1, d), x.dtype), jnp.cumsum(x, axis=1)], axis=1
    )  # (B, T+1, D)
    csum2 = None
    if cfg.normalize_variance:
        csum2 = jnp.concatenate(
            [jnp.zeros((b, 1, d), x.dtype), jnp.cumsum(x * x, axis=1)], axis=1
        )

    tt = jnp.arange(t, dtype=jnp.int32)[None, :]  # (1, T)
    n = num_valid[:, None]  # (B, 1)
    win = jnp.minimum(w, jnp.maximum(n, 1))  # effective window size
    if cfg.center:
        start = tt - w // 2
    else:
        # Kaldi non-centered: window ends at t (uses past frames).
        start = tt - w + 1
    start = jnp.clip(start, 0, jnp.maximum(n - win, 0))
    end = start + win  # (B, T)

    def gather_rows(c, idx):
        # c: (B, T+1, D), idx: (B, T) -> (B, T, D)
        return jnp.take_along_axis(c, idx[..., None], axis=1)

    total = gather_rows(csum, end) - gather_rows(csum, start)
    count = (end - start).astype(x.dtype)[..., None]
    mean = total / count
    out = feats - mean
    if cfg.normalize_variance:
        total2 = gather_rows(csum2, end) - gather_rows(csum2, start)
        var = jnp.maximum(total2 / count - mean * mean, 1e-10)
        out = out * jax.lax.rsqrt(var)
    out = out * mask_f[..., None]
    return out[0] if squeeze else out
