"""GMM-UBM training: diagonal and full-covariance EM, TPU-native.

Replaces the Kaldi binaries behind `sid/train_diag_ubm.sh` /
`sid/train_full_ubm.sh` (SURVEY.md §2.2): `gmm-global-init-from-feats`,
`gmm-gselect`, `gmm-global-acc-stats/-est/-sum-accs`,
`gmm-global-to-fgmm`, `fgmm-global-acc-stats/-est`,
`fgmm-global-gselect-to-post`, `fgmm-global-init-from-accs`.

TPU redesign (SURVEY.md §7): the per-frame E-step is batched GEMMs —
diag log-likelihoods are two matmuls; full-cov uses a whitening einsum;
`gselect` pruning keeps Kaldi's top-N + min-post posterior semantics but
is computed as a top-k *mask* over the dense likelihood matrix instead of
building shortlists (no gathers — see ops/framing.py for why gathers are
poison on TPU).  Sufficient stats are accumulated with `lax.map` over
frame chunks (bounded memory) and sum across devices/hosts by simple
addition of the returned stats pytrees — the map-reduce-EM shape of
`train_ivector_extractor.sh:131-149`.

The DNN-posterior variant (`init_full_ubm_from_dnn.sh`) is
`full_gmm_from_posteriors`: any (N, K) posterior matrix — e.g. the AM
net's senone softmax — can stand in for GMM posteriors.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UbmConfig

_LOG_2PI = float(np.log(2.0 * np.pi))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiagGmm:
    weights: jnp.ndarray  # (K,)
    means: jnp.ndarray  # (K, D)
    vars: jnp.ndarray  # (K, D) diagonal covariances

    @property
    def num_comp(self) -> int:
        return self.weights.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    def log_likes(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, D) -> (N, K) per-component log p(x, k): two GEMMs."""
        inv_v = 1.0 / self.vars
        const = (
            jnp.log(self.weights)
            - 0.5
            * (
                jnp.sum(jnp.log(self.vars), axis=1)
                + self.dim * _LOG_2PI
                + jnp.sum(self.means**2 * inv_v, axis=1)
            )
        )  # (K,)
        lin = jnp.dot(x, (self.means * inv_v).T, preferred_element_type=jnp.float32)
        quad = jnp.dot(x * x, (0.5 * inv_v).T, preferred_element_type=jnp.float32)
        return const[None, :] + lin - quad


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FullGmm:
    weights: jnp.ndarray  # (K,)
    means: jnp.ndarray  # (K, D)
    covars: jnp.ndarray  # (K, D, D)

    @property
    def num_comp(self) -> int:
        return self.weights.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    def _whitener(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """inv-chol (K, D, D) and log-normalizers (K,)."""
        chol = jnp.linalg.cholesky(self.covars)
        inv_chol = jax.vmap(
            lambda c: jax.scipy.linalg.solve_triangular(
                c, jnp.eye(self.dim), lower=True
            )
        )(chol)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)), axis=1)
        const = jnp.log(self.weights) - 0.5 * (logdet + self.dim * _LOG_2PI)
        return inv_chol, const

    def log_likes(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, D) -> (N, K): whitening einsum (MXU) + square-reduce."""
        inv_chol, const = self._whitener()
        zx = jnp.einsum("kde,ne->nkd", inv_chol, x, preferred_element_type=jnp.float32)
        zm = jnp.einsum(
            "kde,ke->kd", inv_chol, self.means, preferred_element_type=jnp.float32
        )
        z = zx - zm[None, :, :]
        return const[None, :] - 0.5 * jnp.sum(z * z, axis=-1)


def gselect_posteriors(
    log_likes: jnp.ndarray, num_gselect: int, min_post: float = 0.0
) -> jnp.ndarray:
    """Kaldi gselect+min-post posterior pruning as a dense mask.

    Posteriors are renormalized over the top-``num_gselect`` components
    (fgmm-global-gselect-to-post), then entries < min_post dropped and
    renormalized again (--min-post=0.025).  Returns dense (N, K) with
    zeros outside the shortlist — identical numbers, no shortlists.
    """
    k = log_likes.shape[1]
    n_sel = min(num_gselect, k)
    kth = jax.lax.top_k(log_likes, n_sel)[0][:, -1:]
    masked = jnp.where(log_likes >= kth, log_likes, -jnp.inf)
    post = jax.nn.softmax(masked, axis=1)
    if min_post > 0.0:
        post = jnp.where(post >= min_post, post, 0.0)
        post = post / jnp.maximum(jnp.sum(post, axis=1, keepdims=True), 1e-20)
    return post


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GmmStats:
    """Zero/first/second-order sufficient statistics."""

    gamma: jnp.ndarray  # (K,)
    first: jnp.ndarray  # (K, D)
    second: jnp.ndarray  # diag: (K, D);  full: (K, D, D)

    def __add__(self, other: "GmmStats") -> "GmmStats":
        return GmmStats(
            self.gamma + other.gamma,
            self.first + other.first,
            self.second + other.second,
        )


def _chunked(x: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad to a multiple of chunk and reshape to (C, chunk, D) + mask."""
    n, d = x.shape
    c = -(-n // chunk)
    pad = c * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    mask = jnp.arange(c * chunk) < n
    return xp.reshape(c, chunk, d), mask.reshape(c, chunk)


@partial(jax.jit, static_argnames=("num_gselect", "min_post", "full", "chunk"))
def accumulate_stats(
    gmm_params,
    x: jnp.ndarray,
    num_gselect: int = 0,
    min_post: float = 0.0,
    full: bool = False,
    chunk: int = 4096,
    valid: Optional[jnp.ndarray] = None,
) -> GmmStats:
    """E-step accumulation over frames, chunked for bounded memory.

    ``valid``: optional (N,) bool — rows marked False contribute nothing
    (used by the sharded map-reduce path for cross-device padding)."""
    gmm = gmm_params
    xc, mask = _chunked(x, chunk)
    if valid is not None:
        n, c = x.shape[0], mask.shape[0] * mask.shape[1]
        vp = jnp.pad(valid.astype(bool), (0, c - n))
        mask = mask & vp.reshape(mask.shape)

    def one_chunk(args):
        xb, mb = args
        ll = gmm.log_likes(xb)
        if num_gselect > 0:
            post = gselect_posteriors(ll, num_gselect, min_post)
        else:
            post = jax.nn.softmax(ll, axis=1)
        post = post * mb[:, None]
        gamma = jnp.sum(post, axis=0)
        first = jnp.dot(post.T, xb, preferred_element_type=jnp.float32)
        if full:
            second = jnp.einsum(
                "nk,nd,ne->kde", post, xb, xb, preferred_element_type=jnp.float32
            )
        else:
            second = jnp.dot(post.T, xb * xb, preferred_element_type=jnp.float32)
        return GmmStats(gamma, first, second)

    def scan_fn(acc, args):
        s = one_chunk(args)
        return acc + s, None

    k, d = gmm.means.shape
    init = GmmStats(
        jnp.zeros((k,)),
        jnp.zeros((k, d)),
        jnp.zeros((k, d, d)) if full else jnp.zeros((k, d)),
    )
    out, _ = jax.lax.scan(scan_fn, init, (xc, mask))
    return out


def accumulate_stats_sharded(
    gmm_params,
    x: jnp.ndarray,
    mesh,
    num_gselect: int = 0,
    min_post: float = 0.0,
    full: bool = False,
    chunk: int = 4096,
    axis: str = "data",
) -> GmmStats:
    """Map-reduce E-step over the device mesh — the TPU-native
    `sid/train_ivector_extractor.sh:131-149` / `train_full_ubm.sh:97-108`
    shape: frames shard across the ``axis`` devices, each device
    accumulates its partial `GmmStats`, and one `psum` over ICI replaces
    the 16-process `*-sum-accs` file tree-reduce.  The result is
    replicated on every device and matches the single-device
    `accumulate_stats` up to summation order."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[axis]
    n = x.shape[0]
    per = -(-n // n_dev)
    xp = jnp.pad(jnp.asarray(x, jnp.float32), ((0, per * n_dev - n), (0, 0)))
    valid = jnp.arange(per * n_dev) < n
    local_chunk = min(chunk, per)

    def local(xl, vl):
        s = accumulate_stats(
            gmm_params, xl, num_gselect, min_post, full, local_chunk, valid=vl
        )
        return jax.tree.map(lambda a: jax.lax.psum(a, axis), s)

    # check_vma off: the scan carry inside accumulate_stats starts from
    # replicated zeros and accumulates device-varying chunk stats, which
    # the static varying-axis checker can't type; the psum above makes
    # the output genuinely replicated.
    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P(axis)), out_specs=P(),
        check_vma=False,
    )
    return fn(xp, valid)


# Components with fewer effective frames than this keep their previous
# parameters in the M-step: a starved component's moment estimates are
# garbage (negative "variances" from catastrophic cancellation), which
# would poison the Cholesky whitener with NaNs at 2048-component scale.
# Kaldi guards the same way (min-gaussian-occupancy + variance flooring).
_MIN_COUNT = 5.0


def _mstep_diag(
    stats: GmmStats, cfg: UbmConfig, var_floor: float, prev: Optional[DiagGmm] = None
) -> DiagGmm:
    gamma = np.asarray(stats.gamma)
    total = gamma.sum()
    w = np.maximum(gamma / max(total, 1e-20), cfg.min_gaussian_weight)
    w = w / w.sum()
    denom = np.maximum(gamma, 1e-10)[:, None]
    means = np.asarray(stats.first) / denom
    vars_ = np.asarray(stats.second) / denom - means**2
    vars_ = np.maximum(vars_, var_floor)
    low = gamma < _MIN_COUNT
    if np.any(low) and prev is not None:
        means[low] = np.asarray(prev.means)[low]
        vars_[low] = np.asarray(prev.vars)[low]
    return DiagGmm(jnp.asarray(w), jnp.asarray(means), jnp.asarray(vars_))


def _mstep_full(
    stats: GmmStats, cfg: UbmConfig, var_floor: float, prev: Optional[FullGmm] = None
) -> FullGmm:
    gamma = np.asarray(stats.gamma)
    total = gamma.sum()
    w = np.maximum(gamma / max(total, 1e-20), cfg.min_gaussian_weight)
    w = w / w.sum()
    denom = np.maximum(gamma, 1e-10)
    means = np.asarray(stats.first) / denom[:, None]
    d = means.shape[1]
    covars = np.asarray(stats.second) / denom[:, None, None] - np.einsum(
        "kd,ke->kde", means, means
    )
    covars += var_floor * np.eye(d)[None]
    low = gamma < max(_MIN_COUNT, d / 2.0)  # full-cov needs more mass
    if np.any(low):
        if prev is not None:
            means[low] = np.asarray(prev.means)[low]
            covars[low] = np.asarray(prev.covars)[low]
        else:
            global_cov = np.cov(means[~low].T) + var_floor * np.eye(d) if (~low).sum() > d else np.eye(d)
            covars[low] = global_cov
    # PSD safety: symmetric + eigenvalue floor for any remaining bad apples
    covars = 0.5 * (covars + np.swapaxes(covars, 1, 2))
    return FullGmm(jnp.asarray(w), jnp.asarray(means), jnp.asarray(covars))


def init_diag_from_frames(
    x: np.ndarray, num_comp: int, seed: int = 0
) -> DiagGmm:
    """gmm-global-init-from-feats: means from random frames, shared var."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    idx = rng.choice(n, size=min(num_comp, n), replace=False)
    means = np.asarray(x[idx], np.float64)
    if len(idx) < num_comp:  # duplicate with jitter if too few frames
        extra = means[rng.integers(0, len(idx), num_comp - len(idx))]
        means = np.concatenate([means, extra + rng.normal(scale=1e-2, size=extra.shape)])
    gvar = np.maximum(np.var(np.asarray(x, np.float64), axis=0), 1e-4)
    k = num_comp
    return DiagGmm(
        jnp.full((k,), 1.0 / k),
        jnp.asarray(means, jnp.float32),
        jnp.asarray(np.tile(gvar, (k, 1)), jnp.float32),
    )


def train_diag_ubm(
    frames: np.ndarray, cfg: UbmConfig = UbmConfig(), seed: int = 0
) -> DiagGmm:
    """sid/train_diag_ubm.sh: init-from-feats + gselect EM iterations."""
    x = jnp.asarray(frames[:: cfg.subsample], jnp.float32)
    var_floor = float(np.var(frames, axis=0).mean()) * 1e-4 + 1e-6
    gmm = init_diag_from_frames(np.asarray(x), cfg.num_gauss, seed)
    for _ in range(cfg.num_iters_init):
        stats = accumulate_stats(gmm, x, num_gselect=cfg.num_gselect, full=False)
        gmm = _mstep_diag(stats, cfg, var_floor, prev=gmm)
    return gmm


def diag_to_full(gmm: DiagGmm) -> FullGmm:
    """gmm-global-to-fgmm."""
    covars = jax.vmap(jnp.diag)(gmm.vars)
    return FullGmm(gmm.weights, gmm.means, covars)


def train_full_ubm(
    frames: np.ndarray, diag: DiagGmm, cfg: UbmConfig = UbmConfig()
) -> FullGmm:
    """sid/train_full_ubm.sh: full-cov EM from the diag UBM."""
    x = jnp.asarray(frames[:: cfg.subsample], jnp.float32)
    var_floor = float(np.var(frames, axis=0).mean()) * 1e-4 + 1e-6
    gmm = diag_to_full(diag)
    for _ in range(cfg.num_iters_full):
        stats = accumulate_stats(
            gmm, x, num_gselect=cfg.full_gselect, min_post=0.0, full=True
        )
        gmm = _mstep_full(stats, cfg, var_floor, prev=gmm)
    return gmm


def full_gmm_from_posteriors(
    frames: np.ndarray, posteriors: np.ndarray, var_floor: float = 1e-4
) -> FullGmm:
    """init_full_ubm_from_dnn.sh / fgmm-global-init-from-accs: build a
    full-cov GMM from externally supplied per-frame posteriors (e.g. the
    AM net's senone softmax)."""
    x = jnp.asarray(frames, jnp.float32)
    post = jnp.asarray(posteriors, jnp.float32)
    gamma = jnp.sum(post, axis=0)
    first = jnp.dot(post.T, x, preferred_element_type=jnp.float32)
    second = jnp.einsum("nk,nd,ne->kde", post, x, x, preferred_element_type=jnp.float32)
    stats = GmmStats(gamma, first, second)
    cfg = UbmConfig(num_gauss=post.shape[1])
    return _mstep_full(stats, cfg, var_floor)
