"""On-device (jitted, mesh-sharded) backend numerics.

The numpy backend (`lda.py`, `plda.py`, `vector.py`) is the float64
reference semantics; this module moves the compute-heavy stages onto the
chip, matching BASELINE.json's north star ("PLDA trial scoring sharded
over hosts", "on-device ... PLDA length-norm scoring"):

- ``plda_score_matrix_device``: the (models x tests) LLR trial matrix as
  two GEMMs + elementwise, jitted (the `ivector-plda-scoring` hot loop,
  `egs/sre/v2/run_sre10.sh:239-246`).
- ``plda_score_matrix_sharded``: the same matrix with the model axis
  sharded over the mesh's data axis via shard_map — each device scores
  its slice of enrollment models against the replicated test set; no
  collectives needed (embarrassingly parallel over trials, the TPU-native
  shape of the reference's 32-process run.pl fan-out).
- ``scatter_stats_device``: per-class sums / within+between scatter
  matrices via segment-sums + one GEMM — the E-step-shaped stage shared
  by LDA (`ivector-compute-lda`) and PLDA EM initialization.
- ``plda_em_device``: the two-covariance EM loop with batched per-speaker
  posterior solves on-device (blocked over speakers to bound memory).
- ``length_normalize_device``: ivector-normalize-length on-device.

Parity with the float64 numpy path is pinned by tests/test_backend.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .plda import Plda, _diagonalize

_LOG_2PI = float(np.log(2.0 * np.pi))


def length_normalize_device(vectors: jnp.ndarray,
                            scale_to_sqrt_dim: bool = True) -> jnp.ndarray:
    """Kaldi ivector-normalize-length, jittable: x * sqrt(dim)/||x||."""
    v = jnp.asarray(vectors, jnp.float32)
    norms = jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    target = math.sqrt(v.shape[-1]) if scale_to_sqrt_dim else 1.0
    return v * (target / norms)


def _llr_terms(psi: jnp.ndarray, u: jnp.ndarray, n: jnp.ndarray):
    """Per-model terms of the diagonalized-space LLR (see plda.py)."""
    npsi = n[:, None] * psi[None, :]  # (M, D)
    mean_scale = npsi / (npsi + 1.0)
    var_given = 1.0 + psi[None, :] / (npsi + 1.0)  # (M, D)
    c = mean_scale * u  # conditional means (M, D)
    inv_g = 1.0 / var_given
    log_det_g = jnp.sum(jnp.log(var_given), axis=1)  # (M,)
    const_m = jnp.sum(c * c * inv_g, axis=1)  # (M,)
    return c, inv_g, log_det_g, const_m


def _llr_block(psi, u, n, v2_proj_ready, v, d):
    """(M_block, N) LLR block given preprocessed test-side pieces."""
    c, inv_g, log_det_g, const_m = _llr_terms(psi, u, n)
    # The barrier stops XLA:TPU from fusing the elementwise term chain
    # into the GEMMs: that fusion candidate SIGILLs the TPU compiler's
    # priority-fusion cost model (TpuPriorityFusionQueue::
    # NormalizedComputationCost, observed on v5e at 4096x4096x150).
    # Cost: materializing ~(M+N)xD f32 intermediates (a few MB) that the
    # two (M,D)x(D,N) GEMMs dwarf.
    c, inv_g, log_det_g, const_m, v, v2_proj_ready = (
        jax.lax.optimization_barrier(
            (c, inv_g, log_det_g, const_m, v, v2_proj_ready)))
    # quad[m, t] = sum_d v_td^2 inv_g_md - 2 v_td c_md inv_g_md + const_m
    quad = (
        jnp.einsum("td,md->mt", v2_proj_ready, inv_g)
        - 2.0 * jnp.einsum("td,md->mt", v, c * inv_g)
        + const_m[:, None]
    )
    log_given = -0.5 * (d * _LOG_2PI + log_det_g[:, None] + quad)
    return log_given


def plda_score_matrix_device(
    plda: Plda,
    enroll: jnp.ndarray,  # (M, D) raw-space enrollment vectors
    test: jnp.ndarray,  # (N, D) raw-space test vectors
    num_utts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full (M, N) LLR matrix on device, f32.

    Same math as the float64 `plda_score_matrix` (parity pinned in
    tests); preprocessing (center + diagonalizing projection) happens
    inside so callers pass raw length-normalized vectors.
    """
    mean = jnp.asarray(plda.mean, jnp.float32)
    t = jnp.asarray(plda.transform, jnp.float32)
    psi = jnp.asarray(plda.psi, jnp.float32)
    d = int(psi.shape[0])

    u = (jnp.asarray(enroll, jnp.float32) - mean) @ t.T
    v = (jnp.asarray(test, jnp.float32) - mean) @ t.T
    m = u.shape[0]
    n = jnp.ones((m,), jnp.float32) if num_utts is None else (
        jnp.asarray(num_utts, jnp.float32))

    log_given = _llr_block(psi, u, n, v * v, v, d)
    var_without = 1.0 + psi
    log_without = -0.5 * (
        d * _LOG_2PI
        + jnp.sum(jnp.log(var_without))
        + jnp.sum(v * v / var_without[None, :], axis=1)
    )  # (N,)
    return log_given - log_without[None, :]


def plda_score_matrix_sharded(
    plda: Plda,
    enroll: np.ndarray,
    test: np.ndarray,
    mesh,
    num_utts: Optional[np.ndarray] = None,
    axis: str = "data",
) -> np.ndarray:
    """(M, N) LLR matrix with models sharded over the mesh.

    Each device scores M/n_dev enrollment models against the full
    (replicated) test set — trial scoring is embarrassingly parallel over
    the model axis, so the only communication is the final gather of the
    output shards (and over multiple hosts each host only materializes
    its own shard; `jax.experimental.multihost_utils` can gather if a
    single host needs the full matrix).
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[axis]
    m = enroll.shape[0]
    per = -(-m // n_dev)
    pad = per * n_dev - m
    e = np.pad(np.asarray(enroll, np.float32), ((0, pad), (0, 0)))
    n = np.ones(m) if num_utts is None else np.asarray(num_utts)
    n = np.pad(n.astype(np.float32), (0, pad), constant_values=1.0)

    mean = jnp.asarray(plda.mean, jnp.float32)
    t = jnp.asarray(plda.transform, jnp.float32)
    psi = jnp.asarray(plda.psi, jnp.float32)
    d = int(psi.shape[0])

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None)),
        out_specs=P(axis, None),
    )
    def score_shard(e_blk, n_blk, v_full):
        u = (e_blk - mean) @ t.T
        v = (v_full - mean) @ t.T
        log_given = _llr_block(psi, u, n_blk, v * v, v, d)
        var_without = 1.0 + psi
        log_without = -0.5 * (
            d * _LOG_2PI
            + jnp.sum(jnp.log(var_without))
            + jnp.sum(v * v / var_without[None, :], axis=1)
        )
        return log_given - log_without[None, :]

    out = jax.jit(score_shard)(
        jnp.asarray(e), jnp.asarray(n), jnp.asarray(test, jnp.float32)
    )
    return np.asarray(out)[:m]


# --------------------------------------------------------------------------
# Scatter statistics (shared E-step shape of LDA + PLDA init)
# --------------------------------------------------------------------------


def encode_labels(labels: Sequence) -> Tuple[np.ndarray, int]:
    """Stable integer encoding of arbitrary hashable class labels."""
    uniq = {}
    ids = np.empty(len(labels), np.int32)
    for i, lab in enumerate(labels):
        ids[i] = uniq.setdefault(lab, len(uniq))
    return ids, len(uniq)


@partial(jax.jit, static_argnames=("num_classes",))
def scatter_stats_device(
    vectors: jnp.ndarray, label_ids: jnp.ndarray, num_classes: int
):
    """Per-class stats on device: (class_sums, class_counts, sw, mean).

    sw is the within-class scatter sum_k sum_i (x-m_k)(x-m_k)' computed as
    X'X - sum_k n_k m_k m_k' (one big GEMM + a small per-class GEMM) —
    the heavy O(N D^2) stage of both `ivector-compute-lda` and PLDA EM
    initialization runs on the MXU.
    """
    x = jnp.asarray(vectors, jnp.float32)
    n, d = x.shape
    sums = jax.ops.segment_sum(x, label_ids, num_segments=num_classes)
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.float32), label_ids, num_segments=num_classes
    )
    mean = jnp.sum(sums, axis=0) / n
    gram = x.T @ x  # (D, D)
    safe = jnp.maximum(counts, 1.0)
    means_k = sums / safe[:, None]
    sw = gram - jnp.einsum("k,kd,ke->de", counts, means_k, means_k)
    return sums, counts, sw, mean


# --------------------------------------------------------------------------
# PLDA EM on device
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("block",))
def _plda_em_iteration(
    phi_b: jnp.ndarray,
    phi_w: jnp.ndarray,
    means: jnp.ndarray,  # (K, D) per-speaker means of CENTERED data
    counts: jnp.ndarray,  # (K,)
    sw: jnp.ndarray,  # (D, D) pooled within scatter
    n_total: float,
    block: int = 512,
):
    """One EM iteration; speakers processed in blocks of ``block`` via
    lax.map so the (block, D, D) posterior covariances bound memory."""
    d = phi_b.shape[0]
    k = means.shape[0]
    inv_b = jnp.linalg.inv(phi_b)
    inv_w = jnp.linalg.inv(phi_w)

    nblk = -(-k // block)
    pad = nblk * block - k
    means_p = jnp.pad(means, ((0, pad), (0, 0)))
    counts_p = jnp.pad(counts, (0, pad))  # padded speakers: count 0
    means_b = means_p.reshape(nblk, block, d)
    counts_b = counts_p.reshape(nblk, block)

    def block_stats(args):
        m_blk, c_blk = args  # (block, D), (block,)
        lam = inv_b[None] + c_blk[:, None, None] * inv_w[None]  # (b, D, D)
        cov = jnp.linalg.inv(lam)
        # posterior means w = (c * m) @ inv_w @ cov  per speaker
        rhs = (m_blk * c_blk[:, None]) @ inv_w  # (b, D)
        w = jnp.einsum("bd,bde->be", rhs, cov)
        valid = (c_blk > 0).astype(jnp.float32)
        covv = cov * valid[:, None, None]
        sum_cov = jnp.sum(covv, axis=0)
        diff = (m_blk - w) * valid[:, None]
        sum_resid = jnp.einsum("b,bd,be->de", c_blk, diff, diff) + jnp.einsum(
            "b,bde->de", c_blk, covv
        )
        wv = w * valid[:, None]
        return sum_cov, sum_resid, wv.T @ wv

    sum_cov, sum_resid, wtw = jax.lax.map(block_stats, (means_b, counts_b))
    sum_cov = jnp.sum(sum_cov, axis=0)
    sum_resid = jnp.sum(sum_resid, axis=0)
    wtw = jnp.sum(wtw, axis=0)

    phi_b_new = (sum_cov + wtw) / k + 1e-10 * jnp.eye(d)
    phi_w_new = (sw + sum_resid) / n_total + 1e-10 * jnp.eye(d)
    return phi_b_new, phi_w_new


def train_plda_device(
    vectors: np.ndarray,
    labels: Sequence,
    num_iters: int = 10,
    block: int = 512,
) -> Plda:
    """Two-covariance PLDA EM with E-steps on device.

    Same model/init as the float64 `train_plda`; the per-iteration
    speaker-posterior solves and stats reductions run jitted in f32
    (parity within f32 tolerance pinned by tests).  Diagonalization is a
    single small (D, D) eigendecomposition and stays on host in float64.
    """
    ids, k = encode_labels(labels)
    if k < 2:
        raise ValueError("PLDA needs >= 2 speakers")
    x = np.asarray(vectors, np.float32)
    n_total, d = x.shape
    sums, counts, sw, mean = scatter_stats_device(
        jnp.asarray(x), jnp.asarray(ids), k
    )
    sums, counts, sw, mean = map(np.asarray, (sums, counts, sw, mean))
    means = sums / counts[:, None] - mean[None, :]

    # init matches train_plda: between = biased covar of class means,
    # within = pooled scatter / (N - K)
    mc = means - means.mean(axis=0)
    phi_b = (mc.T @ mc) / k + 1e-6 * np.eye(d)
    phi_w = sw / max(n_total - k, 1) + 1e-6 * np.eye(d)

    phi_b_j = jnp.asarray(phi_b, jnp.float32)
    phi_w_j = jnp.asarray(phi_w, jnp.float32)
    means_j = jnp.asarray(means, jnp.float32)
    counts_j = jnp.asarray(counts, jnp.float32)
    sw_j = jnp.asarray(sw, jnp.float32)
    for _ in range(num_iters):
        phi_b_j, phi_w_j = _plda_em_iteration(
            phi_b_j, phi_w_j, means_j, counts_j, sw_j,
            float(n_total), block=min(block, max(k, 1)),
        )

    phi_b = np.asarray(phi_b_j, np.float64)
    phi_w = np.asarray(phi_w_j, np.float64)
    # symmetrize f32 roundoff before the host eigh
    phi_b = 0.5 * (phi_b + phi_b.T)
    phi_w = 0.5 * (phi_w + phi_w.T)
    return _diagonalize(np.asarray(mean, np.float64), phi_b, phi_w)


# --------------------------------------------------------------------------
# LDA on device
# --------------------------------------------------------------------------


def compute_lda_device(
    vectors: np.ndarray,
    labels: Sequence,
    lda_dim: int,
    total_covariance_factor: float = 0.0,
):
    """`ivector-compute-lda` with the O(N D^2) scatter accumulation on
    device; the small (D, D) whitening/eigh stays host float64.  Returns
    the same `LdaTransform` as the numpy `compute_lda` (parity in tests).
    """
    from .lda import LdaTransform

    x = np.asarray(vectors, np.float32)
    n, d = x.shape
    if lda_dim > d:
        raise ValueError(f"lda_dim {lda_dim} > feature dim {d}")
    ids, k = encode_labels(labels)
    if k <= lda_dim:
        raise ValueError(f"need > lda_dim={lda_dim} classes, got {k}")

    sums, counts, sw, mean = scatter_stats_device(
        jnp.asarray(x), jnp.asarray(ids), k
    )
    sums, counts, sw, mean = map(
        lambda a: np.asarray(a, np.float64), (sums, counts, sw, mean)
    )
    # class means about the global mean; sb = sum_k n_k m_k m_k'
    means_k = sums / counts[:, None] - mean[None, :]
    sb = np.einsum("k,kd,ke->de", counts, means_k, means_k)
    sw = np.asarray(sw, np.float64)
    sw /= n
    sb /= n

    st = sw + sb
    w = (1.0 - total_covariance_factor) * sw + total_covariance_factor * st
    evals, evecs = np.linalg.eigh(w)
    floor = max(evals.max() * 1e-10, 1e-12)
    inv_sqrt = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, floor))) @ evecs.T
    b_white = inv_sqrt @ sb @ inv_sqrt
    bvals, bvecs = np.linalg.eigh(b_white)
    order = np.argsort(bvals)[::-1][:lda_dim]
    proj = bvecs[:, order].T @ inv_sqrt
    return LdaTransform(projection=proj, mean=mean)
