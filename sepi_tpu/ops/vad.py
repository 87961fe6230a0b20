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


# --------------------------------------------------- GMM-based VAD variant
#
# `sid/compute_vad_decision_gmm.sh` (161 LoC): per-frame log-likelihoods
# under N class GMMs (speech / music / noise ...; fgmm-global-get-frame-
# likes), mapped to a 0/1 decision by `compute-vad-from-frame-likes`
# (argmax of loglike + log prior -> class map), optionally intersected
# with the energy VAD by `merge-vads`.  The GMM scoring is the same
# GEMM-shaped log_likes the classical stack uses; the class decision is
# one argmax — all batched, no per-frame loops.


def vad_from_frame_likes(
    frame_likes: jnp.ndarray,
    frame_mask: jnp.ndarray,
    speech_classes=(0,),
    priors=None,
) -> jnp.ndarray:
    """compute-vad-from-frame-likes semantics.

    Args:
      frame_likes: (K, T) or (B, K, T) per-class frame log-likelihoods.
      frame_mask: (T,) / (B, T) validity.
      speech_classes: class indices whose win maps to voiced (the --map
        config: class -> {0,1}).
      priors: optional length-K log-prior offsets (--priors, log-domain
        here; Kaldi takes linear priors).
    Returns: bool voiced mask shaped like frame_mask.
    """
    squeeze = frame_likes.ndim == 2
    if squeeze:
        frame_likes, frame_mask = frame_likes[None], frame_mask[None]
    ll = frame_likes
    if priors is not None:
        ll = ll + jnp.asarray(priors, ll.dtype)[None, :, None]
    best = jnp.argmax(ll, axis=1)  # (B, T)
    speech = jnp.zeros(ll.shape[1], bool).at[jnp.asarray(speech_classes)].set(True)
    voiced = speech[best] & frame_mask
    return voiced[0] if squeeze else voiced


def merge_vads(vad_a: jnp.ndarray, vad_b: jnp.ndarray) -> jnp.ndarray:
    """merge-vads with the standard min/intersection map: a frame is
    voiced only if both sources agree (the config the reference recipes
    pair with the energy VAD)."""
    return vad_a & vad_b


def train_vad_gmms(
    frames,
    voiced,
    num_comps: int = 8,
    num_iters: int = 4,
    seed: int = 0,
):
    """Bootstrap per-class diag GMMs from an initial energy-VAD labeling.

    The reference assumes externally trained class UBMs (music/speech/
    noise dirs); without those corpus artifacts, the natural provider is
    self-bootstrapping: energy-VAD labels split the frames, one diag GMM
    per class is EM-trained on each side.  Returns [speech_gmm,
    nonspeech_gmm] for `gmm_vad`.
    """
    import numpy as np

    from ..classical.gmm import _mstep_diag, accumulate_stats, init_diag_from_frames
    from ..config import UbmConfig

    frames = np.asarray(frames)
    voiced = np.asarray(voiced, bool)
    gmms = []
    cfg = UbmConfig(num_gauss=num_comps, num_gselect=num_comps)
    for sel in (voiced, ~voiced):
        x = frames[sel]
        if len(x) < num_comps * 4:
            raise ValueError(f"too few frames ({len(x)}) to train a VAD class GMM")
        floor = float(np.var(x, axis=0).mean()) * 1e-4 + 1e-8
        g = init_diag_from_frames(x, num_comps, seed)
        for _ in range(num_iters):
            stats = accumulate_stats(g, jnp.asarray(x), num_gselect=num_comps)
            g = _mstep_diag(stats, cfg, floor)
        gmms.append(g)
    return gmms


def gmm_vad(
    feats: jnp.ndarray,
    frame_mask: jnp.ndarray,
    class_gmms,
    speech_classes=(0,),
    priors=None,
    energy_voiced=None,
) -> jnp.ndarray:
    """GMM-based VAD decision for one utterance (or batch via vmap).

    ``class_gmms``: sequence of DiagGmm/FullGmm exposing ``log_likes``
    (index 0 = speech by the `train_vad_gmms` convention).  With
    ``energy_voiced`` the result is intersected like `merge-vads`."""
    # per-class total frame loglike: logsumexp over mixture components
    ll = jnp.stack([
        jax.scipy.special.logsumexp(g.log_likes(feats), axis=-1)
        for g in class_gmms
    ])  # (K, T)
    voiced = vad_from_frame_likes(ll, frame_mask, speech_classes, priors)
    if energy_voiced is not None:
        voiced = merge_vads(voiced, energy_voiced)
    return voiced
