"""GMM-UBM and i-vector tests on synthetic Gaussian data (SURVEY.md §4:
'GMM/PLDA EM on synthetic data with known parameters')."""

import numpy as np
import pytest

from sepi_tpu.classical import (
    DiagGmm,
    FullGmm,
    diag_to_full,
    extract_ivectors,
    train_diag_ubm,
    train_full_ubm,
)
from sepi_tpu.classical.gmm import (
    accumulate_stats,
    full_gmm_from_posteriors,
    gselect_posteriors,
    init_diag_from_frames,
)
from sepi_tpu.classical.ivector import (
    IvectorConfig,
    init_extractor,
    posterior_ivectors,
    stats_from_features,
    train_ivector_extractor,
    utterance_stats,
)
from sepi_tpu.config import UbmConfig

import jax.numpy as jnp


def _mixture_data(rng, n=4000, d=4):
    """Three well-separated diagonal Gaussians."""
    centers = np.array([[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0]])[:, :d]
    scales = np.array([0.5, 1.0, 0.7])
    comp = rng.integers(0, 3, size=n)
    x = centers[comp] + rng.normal(size=(n, d)) * scales[comp][:, None]
    return x.astype(np.float32), comp


def test_diag_loglikes_match_scipy(rng):
    x, _ = _mixture_data(rng, n=50)
    k, d = 3, 4
    gmm = DiagGmm(
        jnp.asarray(np.array([0.5, 0.3, 0.2], np.float32)),
        jnp.asarray(rng.normal(size=(k, d)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 2.0, size=(k, d)).astype(np.float32)),
    )
    ll = np.asarray(gmm.log_likes(jnp.asarray(x)))
    # independent direct computation
    for i in range(5):
        for kk in range(k):
            m = np.asarray(gmm.means)[kk]
            v = np.asarray(gmm.vars)[kk]
            w = np.asarray(gmm.weights)[kk]
            ref = (
                np.log(w)
                - 0.5 * np.sum(np.log(2 * np.pi * v))
                - 0.5 * np.sum((x[i] - m) ** 2 / v)
            )
            assert ll[i, kk] == pytest.approx(ref, rel=1e-4, abs=1e-3)


def test_full_loglikes_match_diag_for_diag_covars(rng):
    x, _ = _mixture_data(rng, n=30)
    gmm = DiagGmm(
        jnp.asarray(np.array([0.5, 0.3, 0.2], np.float32)),
        jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 2.0, size=(3, 4)).astype(np.float32)),
    )
    fg = diag_to_full(gmm)
    np.testing.assert_allclose(
        np.asarray(fg.log_likes(jnp.asarray(x))),
        np.asarray(gmm.log_likes(jnp.asarray(x))),
        rtol=1e-4,
        atol=1e-3,
    )


def test_gselect_posteriors_prune_and_renormalize(rng):
    ll = jnp.asarray(rng.normal(size=(10, 8)).astype(np.float32))
    post = np.asarray(gselect_posteriors(ll, num_gselect=3, min_post=0.0))
    assert np.all(np.sum(post > 0, axis=1) <= 3)
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-5)
    # min_post drops small entries
    post2 = np.asarray(gselect_posteriors(ll, num_gselect=8, min_post=0.2))
    assert np.all((post2 == 0) | (post2 >= 0.2 / (1 + 1e-5)))


def test_diag_ubm_recovers_mixture(rng):
    x, comp = _mixture_data(rng, n=6000)
    cfg = UbmConfig(num_gauss=3, num_gselect=3, num_iters_init=15, subsample=1)
    gmm = train_diag_ubm(x, cfg, seed=1)
    means = np.asarray(gmm.means)
    # each true center matched by some component
    centers = np.array([[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0]])
    for c in centers:
        dists = np.linalg.norm(means - c, axis=1)
        assert dists.min() < 0.5, f"no component near {c}: {means}"
    w = np.asarray(gmm.weights)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
    assert w.min() > 0.15  # roughly balanced mixture


def test_full_ubm_improves_likelihood(rng):
    x, _ = _mixture_data(rng, n=4000)
    # correlated noise so full-covariance has something to gain
    mix = np.array([[1.0, 0.6, 0, 0], [0.6, 1.0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    x = (x @ mix.T).astype(np.float32)
    cfg = UbmConfig(num_gauss=3, num_gselect=3, num_iters_init=10, num_iters_full=5, subsample=1)
    diag = train_diag_ubm(x, cfg, seed=0)
    full = train_full_ubm(x, diag, cfg)
    import jax

    tot_diag = float(np.mean(jax.scipy.special.logsumexp(diag.log_likes(jnp.asarray(x)), axis=1)))
    tot_full = float(np.mean(jax.scipy.special.logsumexp(full.log_likes(jnp.asarray(x)), axis=1)))
    assert tot_full >= tot_diag - 1e-3


def test_accumulate_stats_masking(rng):
    x, _ = _mixture_data(rng, n=100)
    gmm = init_diag_from_frames(x, 4, seed=0)
    s_all = accumulate_stats(gmm, jnp.asarray(x), num_gselect=4, chunk=32)
    assert float(np.asarray(s_all.gamma).sum()) == pytest.approx(100.0, abs=1e-3)


def test_full_gmm_from_posteriors(rng):
    x, comp = _mixture_data(rng, n=2000)
    post = np.eye(3)[comp].astype(np.float32)  # oracle posteriors
    gmm = full_gmm_from_posteriors(x, post)
    centers = np.array([[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0]])
    means = np.asarray(gmm.means)
    # with oracle posteriors the means are the class means
    for c in centers:
        assert np.linalg.norm(means - c, axis=1).min() < 0.2


# ------------------------------------------------------------- i-vector


def _ivector_world(rng, num_spk=12, utts=4, frames=300, d=6, m=3):
    """Data generated from an actual T-matrix model: speaker offsets live
    in an m-dim subspace of the supervector space."""
    k = 4
    comp_means = rng.normal(size=(k, d)).astype(np.float64) * 4
    t_true = rng.normal(size=(k, d, m)) * 1.0
    feats = {}
    spk_of = {}
    for s in range(num_spk):
        w = rng.normal(size=m)
        for u in range(utts):
            utt = f"s{s:02d}u{u}"
            comp = rng.integers(0, k, size=frames)
            x = comp_means[comp] + np.einsum("ndm,m->nd", t_true[comp], w)
            x += rng.normal(size=(frames, d)) * 0.5
            feats[utt] = x.astype(np.float32)
            spk_of[utt] = s
    return feats, spk_of, comp_means


def test_ivector_em_and_extraction(rng):
    feats, spk_of, _ = _ivector_world(rng)
    all_frames = np.concatenate(list(feats.values()))
    cfg = UbmConfig(num_gauss=4, num_gselect=4, num_iters_init=8, num_iters_full=4, subsample=2)
    diag = train_diag_ubm(all_frames, cfg, seed=0)
    ubm = train_full_ubm(all_frames, diag, cfg)

    ivcfg = IvectorConfig(ivector_dim=3, num_iters=6)
    ext = init_extractor(ubm, ivcfg.ivector_dim, seed=0)
    utt_ids, stats = stats_from_features(ext, ubm, feats, ivcfg, num_gselect=4)
    ext = train_ivector_extractor(ext, stats, ivcfg)
    ivecs = extract_ivectors(ext, stats, ivcfg)
    assert ivecs.shape == (len(utt_ids), 3)
    assert np.all(np.isfinite(ivecs))

    # same-speaker i-vectors closer than different-speaker (cosine)
    iv = ivecs / (np.linalg.norm(ivecs, axis=1, keepdims=True) + 1e-9)
    same, diff = [], []
    for i, ui in enumerate(utt_ids):
        for j, uj in enumerate(utt_ids):
            if i < j:
                (same if spk_of[ui] == spk_of[uj] else diff).append(float(iv[i] @ iv[j]))
    assert np.mean(same) > np.mean(diff) + 0.3


def test_posterior_ivector_shrinks_with_few_frames(rng):
    """With near-zero stats the posterior mean shrinks to the prior (0)."""
    feats, _, _ = _ivector_world(rng, num_spk=2, utts=1)
    all_frames = np.concatenate(list(feats.values()))
    cfg = UbmConfig(num_gauss=4, num_gselect=4, num_iters_init=4, num_iters_full=2, subsample=2)
    ubm = train_full_ubm(all_frames, train_diag_ubm(all_frames, cfg, 0), cfg)
    ext = init_extractor(ubm, 3, seed=0)
    utt_ids, stats = stats_from_features(ext, ubm, feats, num_gselect=4)
    import dataclasses as dc

    tiny = dc.replace(stats, n=stats.n * 1e-6, f=stats.f * 1e-6)
    w_full, _ = posterior_ivectors(ext, stats)
    w_tiny, _ = posterior_ivectors(ext, tiny)
    assert np.linalg.norm(np.asarray(w_tiny)) < 0.01 * max(np.linalg.norm(np.asarray(w_full)), 1.0)


def test_gmm_estep_map_reduce_on_mesh(rng):
    """Map-reduce EM exercised on the 8-device virtual mesh: frames shard
    over 'data', per-device GmmStats psum over the mesh, and the result
    matches the single-device E-step (the TPU-native
    train_ivector_extractor.sh:131-149 / train_full_ubm.sh:97-108 shape)."""
    from sepi_tpu.classical.gmm import accumulate_stats_sharded
    from sepi_tpu.parallel.mesh import make_mesh

    x, _ = _mixture_data(rng, n=1011, d=4)  # deliberately not divisible by 8
    gmm = init_diag_from_frames(x, 5, seed=1)
    mesh = make_mesh(8)

    for kwargs in ({"num_gselect": 3, "min_post": 0.02}, {"full": True}):
        ref = accumulate_stats(gmm, jnp.asarray(x), chunk=256, **kwargs)
        sh = accumulate_stats_sharded(gmm, jnp.asarray(x), mesh, chunk=256, **kwargs)
        np.testing.assert_allclose(np.asarray(sh.gamma), np.asarray(ref.gamma), rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sh.first), np.asarray(ref.first), rtol=2e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sh.second), np.asarray(ref.second), rtol=2e-5, atol=5e-3)
    # zero-order stats conserve total frame count exactly
    np.testing.assert_allclose(float(np.sum(np.asarray(sh.gamma))), x.shape[0], rtol=1e-5)


def test_gmm_mstep_from_sharded_stats_matches(rng):
    """M-step on psum'd sharded stats == M-step on single-device stats
    (the full map-reduce EM round trip)."""
    from sepi_tpu.classical.gmm import _mstep_diag, accumulate_stats_sharded
    from sepi_tpu.parallel.mesh import make_mesh

    x, _ = _mixture_data(rng, n=900, d=4)
    gmm = init_diag_from_frames(x, 4, seed=0)
    cfg = UbmConfig(num_gauss=4, num_gselect=4)
    floor = float(np.var(x, axis=0).mean()) * 1e-4
    ref = _mstep_diag(accumulate_stats(gmm, jnp.asarray(x), num_gselect=4), cfg, floor)
    sh = _mstep_diag(
        accumulate_stats_sharded(gmm, jnp.asarray(x), make_mesh(8), num_gselect=4),
        cfg, floor,
    )
    np.testing.assert_allclose(np.asarray(sh.means), np.asarray(ref.means), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sh.vars), np.asarray(ref.vars), rtol=1e-4, atol=1e-4)


def test_ivector_estep_shards_and_sums(rng):
    """i-vector E-step map-reduce: per-shard utterance stats tree-add to
    the global stats, and the M-step accumulators psum'd across shards
    match the unsharded ones (ivector-extractor-sum-accs semantics)."""
    from sepi_tpu.classical.ivector import _mstep_accumulate

    feats, _, _ = _ivector_world(rng, num_spk=4, utts=2, frames=120)
    all_frames = np.concatenate(list(feats.values()))
    cfg = UbmConfig(num_gauss=4, num_gselect=4, num_iters_init=4, num_iters_full=2, subsample=2)
    ubm = train_full_ubm(all_frames, train_diag_ubm(all_frames, cfg, 0), cfg)
    ext = init_extractor(ubm, 3, seed=0)

    utt_ids, stats = stats_from_features(ext, ubm, feats, num_gselect=4)
    # shard utterances into 4 "jobs", accumulate independently, tree-add
    import dataclasses as dc

    shards = []
    for j in range(4):
        idx = np.asarray([i for i in range(len(utt_ids)) if i % 4 == j])
        shards.append(dc.replace(stats, n=stats.n[idx], f=stats.f[idx]))
    w, cov = posterior_ivectors(ext, stats)
    a_ref, c_ref = _mstep_accumulate(ext, stats, w, cov)
    a_sum = c_sum = None
    for j, s in enumerate(shards):
        idx = np.asarray([i for i in range(len(utt_ids)) if i % 4 == j])
        aj, cj = _mstep_accumulate(ext, s, w[idx], cov[idx])
        a_sum = aj if a_sum is None else a_sum + aj
        c_sum = cj if c_sum is None else c_sum + cj
    np.testing.assert_allclose(np.asarray(a_sum), np.asarray(a_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_sum), np.asarray(c_ref), rtol=1e-4, atol=1e-4)
