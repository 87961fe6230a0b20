"""Energy-based voice activity detection (compute-vad compatible).

Replaces Kaldi `compute-vad` as invoked by
`sid/compute_vad_decision.sh:56` with `conf/vad.conf` options
(--vad-energy-threshold=5.5 --vad-energy-mean-scale=0.5
--vad-proportion-threshold=0.12 --vad-frames-context=2).

Semantics (kaldi ivector/voice-activity-detection.cc):
  threshold = energy_threshold + energy_mean_scale * mean(log_E over utt)
  frame t is voiced iff, within the context window [t-C, t+C] clipped to
  the utterance, at least ``proportion_threshold`` of the examined frames
  have log_E > threshold.

TPU design: the windowed vote is a 1-D convolution with a ones kernel over
the (above-threshold, valid) indicator pair, fully batched and jitted;
padding frames are excluded from both numerator and denominator via the
frame mask, so one compiled program serves a padded batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import VadConfig


def _window_sum(x: jnp.ndarray, context: int) -> jnp.ndarray:
    """Sum of x over [t-context, t+context] per t; x: (B, T) float32."""
    if context == 0:
        return x
    k = 2 * context + 1
    out = jax.lax.conv_general_dilated(
        x[:, None, :],
        jnp.ones((1, 1, k), x.dtype),
        window_strides=(1,),
        padding=[(context, context)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :]


@partial(jax.jit, static_argnames=("cfg",))
def energy_vad(
    log_energy: jnp.ndarray, frame_mask: jnp.ndarray, cfg: VadConfig = VadConfig()
) -> jnp.ndarray:
    """Batched VAD.

    Args:
      log_energy: (B, T) or (T,) — feats[..., 0] when use_energy=True.
      frame_mask: matching bool validity mask.
    Returns:
      bool voiced mask of the same shape (False on padding).
    """
    squeeze = log_energy.ndim == 1
    if squeeze:
        log_energy, frame_mask = log_energy[None], frame_mask[None]
    mask_f = frame_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask_f, axis=1, keepdims=True), 1.0)
    mean_e = jnp.sum(log_energy * mask_f, axis=1, keepdims=True) / denom
    threshold = cfg.energy_threshold + cfg.energy_mean_scale * mean_e
    above = (log_energy > threshold).astype(jnp.float32) * mask_f
    num = _window_sum(above, cfg.frames_context)
    den = _window_sum(mask_f, cfg.frames_context)
    voiced = (num >= cfg.proportion_threshold * jnp.maximum(den, 1.0)) & frame_mask
    return voiced[0] if squeeze else voiced
