"""i-vector (T-matrix) extractor: EM training and extraction.

Replaces `ivector-extractor-init`, `ivector-extractor-acc-stats`,
`ivector-extractor-sum-accs`, `ivector-extractor-est`, `ivector-extract`
behind `sid/train_ivector_extractor.sh` / `sid/extract_ivectors.sh`
(SURVEY.md §1 L6, §3.5).

Model: frame x from component k ~ N(mu_k + T_k w, Sigma_k), w ~ N(0, I).
Work happens in per-component whitened space (T~_k = W_k T_k with
W_k = chol(Sigma_k)^-1), so the per-utterance posterior is

  L_u = I + sum_k N_uk  T~_k' T~_k        (precomputed U_k = T~_k'T~_k)
  b_u = sum_k T~_k' W_k (F_uk - N_uk mu_k)
  w_u = L_u^{-1} b_u,   cov_u = L_u^{-1}

TPU design: everything is einsums over (utterance, component, dim,
ivector-dim) — the E-step for a batch of utterances is three GEMM-shaped
contractions + a batched Cholesky solve; the map-reduce accumulation of
`train_ivector_extractor.sh:131-149` (16-process tree-sum) becomes
adding stats pytrees across utterance shards.

Documented deviation: Kaldi's IvectorExtractor carries a prior offset on
the first i-vector coordinate (w[0] centered away from 0); downstream
processing subtracts the global mean before LDA/PLDA, which cancels it,
so the standard zero-mean prior is used here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IvectorConfig
from .gmm import FullGmm, gselect_posteriors


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IvectorStats:
    """Per-utterance Baum-Welch stats in whitened space."""

    n: jnp.ndarray  # (U, K) zero-order
    f: jnp.ndarray  # (U, K, D) whitened centered first-order

    def __add__(self, other):
        return IvectorStats(
            jnp.concatenate([self.n, other.n]), jnp.concatenate([self.f, other.f])
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IvectorExtractor:
    t: jnp.ndarray  # (K, D, M) whitened-space total-variability matrix
    whitener: jnp.ndarray  # (K, D, D) W_k = chol(Sigma_k)^-1
    means: jnp.ndarray  # (K, D) UBM means (raw space)

    @property
    def ivector_dim(self) -> int:
        return self.t.shape[2]


def init_extractor(ubm: FullGmm, ivector_dim: int, seed: int = 0) -> IvectorExtractor:
    inv_chol, _ = ubm._whitener()
    k, d = ubm.means.shape
    rng = np.random.default_rng(seed)
    t = rng.normal(size=(k, d, ivector_dim)).astype(np.float32) * 0.1
    return IvectorExtractor(jnp.asarray(t), inv_chol, ubm.means)


@partial(jax.jit, static_argnames=())
def utterance_stats(
    ext: IvectorExtractor,
    feats: jnp.ndarray,  # (U, T, D) padded
    mask: jnp.ndarray,  # (U, T)
    post: jnp.ndarray,  # (U, T, K) posteriors (gselect-pruned)
) -> IvectorStats:
    post = post * mask[..., None]
    n = jnp.sum(post, axis=1)  # (U, K)
    f_raw = jnp.einsum("utk,utd->ukd", post, feats, preferred_element_type=jnp.float32)
    f_cent = f_raw - n[..., None] * ext.means[None]
    f_white = jnp.einsum(
        "kde,uke->ukd", ext.whitener, f_cent, preferred_element_type=jnp.float32
    )
    return IvectorStats(n, f_white)


@jax.jit
def posterior_ivectors(
    ext: IvectorExtractor, stats: IvectorStats, posterior_scale: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched posterior (mean, covariance) of w given utterance stats."""
    m = ext.ivector_dim
    u_mat = jnp.einsum("kdm,kdn->kmn", ext.t, ext.t, preferred_element_type=jnp.float32)
    n = stats.n * posterior_scale
    f = stats.f * posterior_scale
    l_mat = jnp.eye(m)[None] + jnp.einsum(
        "uk,kmn->umn", n, u_mat, preferred_element_type=jnp.float32
    )
    b = jnp.einsum("kdm,ukd->um", ext.t, f, preferred_element_type=jnp.float32)
    chol = jnp.linalg.cholesky(l_mat)
    w = jax.vmap(lambda c, rhs: jax.scipy.linalg.cho_solve((c, True), rhs))(chol, b)
    cov = jax.vmap(lambda c: jax.scipy.linalg.cho_solve((c, True), jnp.eye(m)))(chol)
    return w, cov


@jax.jit
def _mstep_accumulate(ext, stats, w, cov):
    """A_k = sum_u N_uk (cov_u + w w'), C_k = sum_u f_uk w'."""
    wwt = cov + jnp.einsum("um,un->umn", w, w)
    a = jnp.einsum("uk,umn->kmn", stats.n, wwt, preferred_element_type=jnp.float32)
    c = jnp.einsum("ukd,um->kdm", stats.f, w, preferred_element_type=jnp.float32)
    return a, c


def train_ivector_extractor(
    ext: IvectorExtractor,
    stats: IvectorStats,
    cfg: IvectorConfig = IvectorConfig(),
) -> IvectorExtractor:
    """EM on precomputed utterance stats (num_iters M-steps)."""
    for _ in range(cfg.num_iters):
        w, cov = posterior_ivectors(ext, stats, cfg.posterior_scale)
        a, c = _mstep_accumulate(ext, stats, w, cov)
        a_np = np.asarray(a)
        c_np = np.asarray(c)
        k, d, m = ext.t.shape
        t_new = np.zeros((k, d, m), np.float32)
        for kk in range(k):
            # solve T_k A_k = C_k  ->  T_k = C_k A_k^-1 (ridge for safety)
            t_new[kk] = np.linalg.solve(
                a_np[kk] + 1e-6 * np.eye(m), c_np[kk].T
            ).T.astype(np.float32)
        ext = IvectorExtractor(jnp.asarray(t_new), ext.whitener, ext.means)
    return ext


def extract_ivectors(
    ext: IvectorExtractor,
    stats: IvectorStats,
    cfg: IvectorConfig = IvectorConfig(),
) -> np.ndarray:
    """Posterior-mean i-vectors, (U, M)."""
    w, _ = posterior_ivectors(ext, stats, cfg.posterior_scale)
    return np.asarray(w)


def stats_from_features(
    ext: IvectorExtractor,
    ubm: FullGmm,
    features: Mapping[str, np.ndarray],
    cfg: IvectorConfig = IvectorConfig(),
    num_gselect: int = 20,
    batch: int = 8,
    posteriors: Optional[Mapping[str, np.ndarray]] = None,
) -> Tuple[List[str], IvectorStats]:
    """Compute per-utterance stats with UBM gselect posteriors.

    Pads utterances to the max length per batch.  ``posteriors`` (utt ->
    (T, K), frame-aligned with ``features``) replaces the UBM posteriors
    entirely — the DNN/i-vector paired-stream split of
    `train_ivector_extractor_dnn.sh` / `extract_ivectors_dnn.sh`, where
    a senone net evaluated on hires features supplies the alignment of
    frames to components while the sid features supply the stats.
    """
    # length-sorted groups + grid-padded t_max: distinct compiled shapes
    # stay O(length spread / 256) instead of one per group (each compile
    # is ~30 s through a remote-device tunnel)
    utt_ids = sorted(features, key=lambda u: (features[u].shape[0], u))
    all_stats: Optional[IvectorStats] = None
    for i0 in range(0, len(utt_ids), batch):
        group = utt_ids[i0 : i0 + batch]
        t_max = max(features[u].shape[0] for u in group)
        t_max = -(-t_max // 256) * 256
        d = features[group[0]].shape[1]
        feats = np.zeros((len(group), t_max, d), np.float32)
        mask = np.zeros((len(group), t_max), bool)
        for j, u in enumerate(group):
            f = features[u]
            feats[j, : f.shape[0]] = f
            mask[j, : f.shape[0]] = True
        if posteriors is not None:
            k = next(iter(posteriors.values())).shape[1]
            post = np.zeros((len(group), t_max, k), np.float32)
            for j, u in enumerate(group):
                p = posteriors[u]
                if p.shape[0] != features[u].shape[0]:
                    raise ValueError(
                        f"{u}: posteriors rows {p.shape[0]} != frames "
                        f"{features[u].shape[0]} (paired streams must be "
                        "frame-aligned)"
                    )
                post[j, : p.shape[0]] = p
            post = jnp.asarray(post)
        else:
            ll = jax.vmap(ubm.log_likes)(jnp.asarray(feats))
            post = jax.vmap(
                lambda l: gselect_posteriors(l, num_gselect, cfg.min_post)
            )(ll)
        s = utterance_stats(ext, jnp.asarray(feats), jnp.asarray(mask), post)
        all_stats = s if all_stats is None else all_stats + s
    return utt_ids, all_stats
