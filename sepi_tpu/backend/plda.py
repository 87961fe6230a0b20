"""Two-covariance PLDA: EM training, LLR scoring, unsupervised adaptation.

Replaces `ivector-compute-plda` (EM), `ivector-plda-scoring`
(log-likelihood-ratio scoring with by-the-book multi-enroll handling via
--num-utts, `egs/sre/v2/run_sre10.sh:239-246`) and `ivector-adapt-plda`
(covariance interpolation toward in-domain data,
`v2/run_sre16.sh:96-103`, scales 0.75/0.25).

Model: x = mu + y + e,  y ~ N(0, Phi_b) speaker factor, e ~ N(0, Phi_w).
After training, the model is stored *diagonalized*: a transform T with
T Phi_w T' = I and T Phi_b T' = diag(psi) — Kaldi's internal form — so
scoring is elementwise per dimension and the full trial matrix becomes
one batched computation:

  LLR(enroll u with n utts, test v) =
    sum_d [ logN(v_d ; n psi_d/(n psi_d+1) u_d , 1 + psi_d/(n psi_d+1))
          - logN(v_d ; 0, 1 + psi_d) ]

This module is the float64 host reference semantics.  The on-device
paths live in `backend/device.py`: `plda_score_matrix_device` (the LLR
matrix as two GEMMs + elementwise, jitted), `plda_score_matrix_sharded`
(model axis sharded over the mesh — the "PLDA trial scoring sharded over
hosts" item in BASELINE.json), and `train_plda_device` (EM with batched
on-device E-steps).  Parity between the two is pinned by
tests/test_backend.py.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

_LOG_2PI = float(np.log(2.0 * np.pi))


@dataclasses.dataclass
class Plda:
    mean: np.ndarray  # (D,)
    transform: np.ndarray  # (D, D): diagonalizing transform T
    psi: np.ndarray  # (D,) between-class variance in transformed space

    @property
    def dim(self) -> int:
        return self.mean.shape[0]

    def preprocess(self, vectors: np.ndarray) -> np.ndarray:
        """Center + project into the diagonalized space.

        Mirrors Kaldi's TransformIvector (without its optional
        simple-length-norm): scoring inputs must already be
        length-normalized like the recipes do."""
        v = np.asarray(vectors, np.float64)
        return (v - self.mean) @ self.transform.T


def _speaker_stats(vectors: np.ndarray, labels: Sequence):
    by: Mapping = defaultdict(list)
    for i, lab in enumerate(labels):
        by[lab].append(i)
    x = np.asarray(vectors, np.float64)
    counts = np.array([len(idx) for idx in by.values()])
    means = np.stack([x[idx].mean(axis=0) for idx in by.values()])
    d = x.shape[1]
    sw = np.zeros((d, d))
    for idx in by.values():
        dk = x[idx] - x[idx].mean(axis=0)
        sw += dk.T @ dk
    return means, counts, sw


def train_plda(
    vectors: np.ndarray,
    labels: Sequence,
    num_iters: int = 10,
) -> Plda:
    """EM for the two-covariance model on labeled vectors."""
    x = np.asarray(vectors, np.float64)
    n_total, d = x.shape
    mu = x.mean(axis=0)
    xc = x - mu
    means, counts, sw = _speaker_stats(xc, labels)
    k = len(counts)
    if k < 2:
        raise ValueError("PLDA needs >= 2 speakers")

    # init: between = covar of class means, within = pooled within scatter
    phi_b = np.cov(means.T, bias=True) + 1e-6 * np.eye(d)
    phi_w = sw / max(n_total - k, 1) + 1e-6 * np.eye(d)

    for _ in range(num_iters):
        inv_b = np.linalg.inv(phi_b)
        inv_w = np.linalg.inv(phi_w)
        # E-step per distinct count value (vectorized within groups)
        ey = np.zeros_like(means)
        sum_cov = np.zeros((d, d))
        sum_resid = np.zeros((d, d))
        for c in np.unique(counts):
            sel = counts == c
            lam = inv_b + c * inv_w
            cov = np.linalg.inv(lam)
            w = (means[sel] * c) @ inv_w @ cov  # posterior means (speakers,)
            ey[sel] = w
            nsel = int(sel.sum())
            sum_cov += nsel * cov
            diff = means[sel] - w
            sum_resid += c * (diff.T @ diff) + c * nsel * cov
        # M-step
        phi_b = (sum_cov + ey.T @ ey) / k
        phi_w = (sw + sum_resid) / n_total
        phi_b += 1e-10 * np.eye(d)
        phi_w += 1e-10 * np.eye(d)

    return _diagonalize(mu, phi_b, phi_w)


def _diagonalize(mu: np.ndarray, phi_b: np.ndarray, phi_w: np.ndarray) -> Plda:
    """Find T: T phi_w T' = I, T phi_b T' = diag(psi), psi descending."""
    d = mu.shape[0]
    wvals, wvecs = np.linalg.eigh(phi_w)
    floor = max(wvals.max() * 1e-10, 1e-12)
    w_inv_sqrt = wvecs @ np.diag(1.0 / np.sqrt(np.maximum(wvals, floor))) @ wvecs.T
    b_white = w_inv_sqrt @ phi_b @ w_inv_sqrt
    bvals, bvecs = np.linalg.eigh(b_white)
    order = np.argsort(bvals)[::-1]
    t = bvecs[:, order].T @ w_inv_sqrt
    psi = np.maximum(bvals[order], 0.0)
    return Plda(mean=mu, transform=t, psi=psi)


def plda_score_matrix(
    plda: Plda,
    enroll: np.ndarray,  # (M, D) enrollment vectors (speaker means), raw space
    test: np.ndarray,  # (N, D) test vectors, raw space
    num_utts: Optional[np.ndarray] = None,  # (M,) enrollment utterance counts
) -> np.ndarray:
    """Full (M, N) LLR matrix, vectorized.

    ``num_utts`` enables the by-the-book multi-enroll scoring
    (`ivector-plda-scoring --num-utts`): an enrollment that averages n
    utterances has posterior speaker variance psi/(n psi + 1).
    """
    u = plda.preprocess(enroll)  # (M, D)
    v = plda.preprocess(test)  # (N, D)
    psi = plda.psi  # (D,)
    n = np.ones(u.shape[0]) if num_utts is None else np.asarray(num_utts, np.float64)

    npsi = n[:, None] * psi[None, :]  # (M, D)
    mean_scale = npsi / (npsi + 1.0)  # (M, D) — E[y|enroll] = scale * u
    var_given = 1.0 + psi[None, :] / (npsi + 1.0)  # (M, D)
    var_without = 1.0 + psi  # (D,)

    c = mean_scale * u  # (M, D) conditional means
    # logN(v; c, var_g) summed over D:
    #   -0.5*sum[ log(2pi var_g) + (v-c)^2/var_g ]
    # expand (v-c)^2 = v^2 - 2vc + c^2 -> GEMMs over D.
    inv_g = 1.0 / var_given  # (M, D)
    log_det_g = np.sum(np.log(var_given), axis=1)  # (M,)
    quad = (
        (v**2) @ inv_g.T  # (N, M): sum_d v^2 * inv_g
        - 2.0 * v @ (c * inv_g).T
        + np.sum(c * c * inv_g, axis=1)[None, :]  # (1, M)
    ).T  # (M, N)
    log_given = -0.5 * (plda.dim * _LOG_2PI + log_det_g[:, None] + quad)

    log_det_n = np.sum(np.log(var_without))
    quad_n = np.sum((v**2) / var_without[None, :], axis=1)  # (N,)
    log_without = -0.5 * (plda.dim * _LOG_2PI + log_det_n + quad_n)  # (N,)

    return log_given - log_without[None, :]


def adapt_plda(
    plda: Plda,
    adapt_vectors: np.ndarray,
    within_covar_scale: float = 0.75,
    between_covar_scale: float = 0.25,
) -> Plda:
    """ivector-adapt-plda: unsupervised domain adaptation.

    Project the in-domain vectors into the diagonalized space (within=I,
    between=diag(psi)); along every direction where their total variance
    exceeds the model's (1 + psi), distribute the excess into the within
    and between covariances with the given scales, then re-diagonalize.
    Mirrors Kaldi's PldaUnsupervisedAdaptor::UpdatePlda.
    """
    z = plda.preprocess(adapt_vectors)
    z = z - z.mean(axis=0)
    total = (z.T @ z) / z.shape[0]
    evals, evecs = np.linalg.eigh(total)

    d = plda.dim
    within = np.eye(d)
    between = np.diag(plda.psi)
    model_var = 1.0 + plda.psi
    for gamma, vec in zip(evals, evecs.T):
        dir_model_var = float(vec @ (within + between) @ vec)
        excess = gamma - dir_model_var
        if excess > 0:
            within += within_covar_scale * excess * np.outer(vec, vec)
            between += between_covar_scale * excess * np.outer(vec, vec)

    # fold back into the raw space and re-diagonalize
    t_inv = np.linalg.inv(plda.transform)
    phi_w = t_inv @ within @ t_inv.T
    phi_b = t_inv @ between @ t_inv.T
    return _diagonalize(plda.mean, phi_b, phi_w)


def score_trials(
    plda: Plda,
    enroll_vecs: Mapping[str, np.ndarray],
    test_vecs: Mapping[str, np.ndarray],
    trials: Sequence,
    num_utts: Optional[Mapping[str, int]] = None,
    device: bool = False,
) -> Dict[Tuple[str, str], float]:
    """Score a trial list via the dense matrix (models x tests), then join.

    ``device=True`` computes the matrix on-accelerator in f32
    (`backend.device.plda_score_matrix_device` — two GEMMs +
    elementwise); default is the float64 host reference path."""
    models = sorted({t.model for t in trials})
    tests = sorted({t.test for t in trials})
    e = np.stack([enroll_vecs[m] for m in models])
    v = np.stack([test_vecs[t] for t in tests])
    n = None
    if num_utts is not None:
        n = np.array([num_utts.get(m, 1) for m in models], np.float64)
    if device:
        from .device import plda_score_matrix_device

        s = np.asarray(plda_score_matrix_device(plda, e, v, n))
    else:
        s = plda_score_matrix(plda, e, v, n)
    mi = {m: i for i, m in enumerate(models)}
    ti = {t: i for i, t in enumerate(tests)}
    return {(t.model, t.test): float(s[mi[t.model], ti[t.test]]) for t in trials}
