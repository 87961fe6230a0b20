"""Sliding-window cepstral mean (and variance) normalization.

Replaces Kaldi `apply-cmvn-sliding --norm-vars=false --center=true
--cmn-window=300`, used at every feature-consumption site in the reference
(e.g. `sid/nnet3/xvector/extract_xvectors_new.sh:79`,
`local/nnet3/xvector/prepare_feats_for_egs.sh`).

Kaldi window semantics (feat/feature-functions.cc, SlidingWindowCmn):
with --center, frame t's window is [t - w/2, t - w/2 + w), shifted to stay
inside [0, T); the window is always min(w, T) frames.

TPU design: gather-free.  For interior frames the clipped window start is
exactly t - w/2, so the windowed sum is a *static shift* of the exclusive
prefix sum (one subtraction of two slices).  Only the edge regimes differ
— and there the window is CONSTANT per utterance (start pinned to 0 on
the left, to T-w on the right), so each needs just one (B, D) row of the
prefix sum, broadcast and selected by mask.  (A take_along_axis
formulation costs B*T*D gather descriptors; TPU gathers run on the
scalar core — see ops/framing.py.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import CmvnConfig


def _row_at(c: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """c: (B, T+1, D), idx: (B,) -> (B, D): one dynamic row per utt."""
    return jnp.take_along_axis(c, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]


def _cumsum_time(x: jnp.ndarray, blk: int = 256) -> jnp.ndarray:
    """Inclusive cumsum along axis 1 of (B, T, D), MXU-shaped.

    XLA lowers jnp.cumsum to a log2(T)-pass associative scan (~14 memory
    passes at T=10000 — 1.9 ms at bench shapes).  A scan is also a
    triangular matmul: per 256-frame block, `tril(ones) @ block` on the
    MXU gives the intra-block prefix, and a tiny inter-block cumsum of
    block totals supplies the offsets — two memory passes total
    (1.2 ms measured, docs/BENCHMARKS.md).  HIGHEST precision keeps the
    f32 accumulation exact-equivalent (~1e-7 relative, same as the scan).
    """
    b, t, d = x.shape
    pad = (-t) % blk
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    nb = (t + pad) // blk
    xb = xp.reshape(b, nb, blk, d)
    tri = jnp.tril(jnp.ones((blk, blk), x.dtype))
    intra = jnp.einsum(
        "ij,bnjd->bnid", tri, xb, precision=jax.lax.Precision.HIGHEST
    )
    block_tot = xb.sum(axis=2)
    offs = jnp.cumsum(block_tot, axis=1) - block_tot  # exclusive, (B, nb, D)
    out = intra + offs[:, :, None, :]
    return out.reshape(b, nb * blk, d)[:, :t]


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
    half = w // 2
    mask_f = frame_mask.astype(feats.dtype)
    x = feats * mask_f[..., None]
    n = jnp.sum(mask_f, axis=1).astype(jnp.int32)  # (B,) valid frames
    win = jnp.minimum(w, jnp.maximum(n, 1))  # (B,) effective window
    winf = win.astype(x.dtype)[:, None]

    # Exclusive prefix sums over time: csum[:, k] = sum(x[:, :k]).
    def stats_for(c):
        # c: (B, T+1, D) exclusive prefix sums of some quantity
        if cfg.center:
            # interior: start = t - half, end = start + w -> static shifts
            # (pad so the shifted slices exist for every t).  The upper
            # slice can index csum past T (an utterance with
            # half < n < w inside a batch padded to T < w frames, whose
            # row t = half is selected as "interior" with upper index
            # t + w - half): the prefix sum must SATURATE at csum[T]
            # (the total), so pad with edge replication, not zeros —
            # a zero there produced a silently unnormalized frame.
            cp = jnp.pad(c, ((0, 0), (half, w), (0, 0)), mode="edge")
            # at row t: cp[t + half + (w - half)] - cp[t + half - half]
            upper = cp[:, w:w + t]          # csum[t + (w - half)]
            lower = cp[:, 0:t]              # csum[t - half]
            interior = upper - lower
        else:
            cp = jnp.pad(c, ((0, 0), (w, 0), (0, 0)))
            upper = cp[:, w + 1 : w + t + 1]
            lower = cp[:, 1 : t + 1]
            interior = upper - lower
        # left edge: start = 0, window = win  -> constant row per utt
        left = _row_at(c, win)  # (B, D): csum[win] - csum[0]
        # right edge: start = n - win -> constant row per utt
        right = _row_at(c, n) - _row_at(c, jnp.maximum(n - win, 0))
        return interior, left, right

    tt = jnp.arange(t, dtype=jnp.int32)[None, :]  # (1, T)
    if cfg.center:
        start = tt - half
        lo_edge = start < 0
        hi_edge = start > (n[:, None] - win[:, None])
    else:
        start = tt - w + 1
        lo_edge = start < 0
        hi_edge = start > (n[:, None] - win[:, None])
    # A window that spans every valid frame (n <= w) makes ALL frames'
    # stats the global total = the left-edge row.  Routing them there
    # (rather than letting t == half fall into the interior slices)
    # keeps the output bitwise-invariant to the batch pad width: the
    # interior path would read the saturated prefix sum, whose blocked
    # accumulation order differs across pad lengths by ~1e-6.
    lo_edge = lo_edge | (win >= n)[:, None]

    csum = jnp.concatenate(
        [jnp.zeros((b, 1, d), x.dtype), _cumsum_time(x)], axis=1
    )
    int_s, left_s, right_s = stats_for(csum)
    total = jnp.where(
        lo_edge[..., None],
        left_s[:, None, :],
        jnp.where(hi_edge[..., None], right_s[:, None, :], int_s),
    )
    mean = total / winf[..., None]
    out = feats - mean

    if cfg.normalize_variance:
        csum2 = jnp.concatenate(
            [jnp.zeros((b, 1, d), x.dtype), _cumsum_time(x * x)], axis=1
        )
        int_q, left_q, right_q = stats_for(csum2)
        total2 = jnp.where(
            lo_edge[..., None],
            left_q[:, None, :],
            jnp.where(hi_edge[..., None], right_q[:, None, :], int_q),
        )
        var = jnp.maximum(total2 / winf[..., None] - mean * mean, 1e-10)
        out = out * jax.lax.rsqrt(var)
    out = out * mask_f[..., None]
    return out[0] if squeeze else out