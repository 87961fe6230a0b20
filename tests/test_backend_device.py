"""On-device backend parity: jitted/sharded scoring + EM vs the float64
numpy reference path (VERDICT r2 item 3: move the backend onto the device
and shard it)."""

import numpy as np
import pytest

from sepi_tpu.backend import (
    Plda,
    compute_lda,
    compute_lda_device,
    length_normalize,
    length_normalize_device,
    plda_score_matrix,
    plda_score_matrix_device,
    plda_score_matrix_sharded,
    train_plda,
    train_plda_device,
)
from sepi_tpu.parallel import make_mesh


def _synth(rng, num_spk=40, utts=10, dim=8, b_scale=4.0, w_scale=1.0):
    mu = rng.normal(size=dim)
    ys = rng.normal(size=(num_spk, dim)) * np.sqrt(b_scale)
    x, labels = [], []
    for k in range(num_spk):
        e = rng.normal(size=(utts, dim)) * np.sqrt(w_scale)
        x.append(mu + ys[k] + e)
        labels += [k] * utts
    return np.concatenate(x), labels


def test_length_normalize_device(rng):
    v = rng.normal(size=(7, 12)).astype(np.float32)
    got = np.asarray(length_normalize_device(v))
    want = length_normalize(v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_plda_score_device_matches_numpy(rng):
    x, labels = _synth(rng, num_spk=30, utts=8, dim=10)
    plda = train_plda(x, labels, num_iters=8)
    enroll = rng.normal(size=(9, 10))
    test = rng.normal(size=(13, 10))
    n = rng.integers(1, 6, size=9).astype(np.float64)
    want = plda_score_matrix(plda, enroll, test, n)
    got = np.asarray(plda_score_matrix_device(plda, enroll, test, n))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-3 * scale, rtol=1e-3)


def test_plda_score_sharded_matches_device(rng):
    """8-device mesh, model count NOT divisible by the mesh (padding path)."""
    x, labels = _synth(rng, num_spk=25, utts=6, dim=6)
    plda = train_plda(x, labels, num_iters=6)
    mesh = make_mesh(num_devices=8)
    enroll = rng.normal(size=(13, 6))
    test = rng.normal(size=(17, 6))
    n = rng.integers(1, 4, size=13).astype(np.float64)
    want = plda_score_matrix(plda, enroll, test, n)
    got = plda_score_matrix_sharded(plda, enroll, test, mesh, n)
    assert got.shape == want.shape == (13, 17)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-3 * scale, rtol=1e-3)


def test_train_plda_device_matches_numpy(rng):
    x, labels = _synth(rng, num_spk=50, utts=12, dim=8, b_scale=3.0)
    ref = train_plda(x, labels, num_iters=10)
    dev = train_plda_device(x, labels, num_iters=10, block=16)
    # model-space parity: psi spectra agree and trial scores agree
    np.testing.assert_allclose(dev.psi, ref.psi, rtol=0.05, atol=0.05)
    enroll = rng.normal(size=(5, 8))
    test = rng.normal(size=(7, 8))
    s_ref = plda_score_matrix(ref, enroll, test)
    s_dev = plda_score_matrix(dev, enroll, test)
    scale = np.abs(s_ref).max()
    np.testing.assert_allclose(s_dev, s_ref, atol=0.02 * scale, rtol=0.02)


def test_train_plda_device_uneven_blocks(rng):
    """Speaker count not a multiple of the E-step block (padding path)."""
    x, labels = _synth(rng, num_spk=23, utts=5, dim=5)
    dev = train_plda_device(x, labels, num_iters=5, block=8)
    ref = train_plda(x, labels, num_iters=5)
    np.testing.assert_allclose(dev.psi, ref.psi, rtol=0.05, atol=0.05)


def test_compute_lda_device_matches_numpy(rng):
    x, labels = _synth(rng, num_spk=30, utts=20, dim=12, b_scale=2.0)
    ref = compute_lda(x, labels, lda_dim=6)
    dev = compute_lda_device(x, labels, lda_dim=6)
    np.testing.assert_allclose(dev.mean, ref.mean, atol=1e-4)
    # rows may flip sign; compare per-row cosine magnitude
    for r_ref, r_dev in zip(ref.projection, dev.projection):
        cos = abs(r_ref @ r_dev) / (np.linalg.norm(r_ref) * np.linalg.norm(r_dev))
        assert cos == pytest.approx(1.0, abs=1e-3)


def test_device_score_handles_default_num_utts(rng):
    x, labels = _synth(rng, num_spk=15, utts=6, dim=6)
    plda = train_plda(x, labels, num_iters=5)
    e = rng.normal(size=(4, 6))
    t = rng.normal(size=(5, 6))
    want = plda_score_matrix(plda, e, t)
    got = np.asarray(plda_score_matrix_device(plda, e, t))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-3 * scale, rtol=1e-3)


def test_backend_eval_device_scoring_flag(rng):
    """BackendConfig(device_scoring=True) routes the driver backend's
    trial matrix through the on-device scorer; EER/scores must match the
    float64 host path (the production reachability of VERDICT r2 #3)."""
    from sepi_tpu.config import BackendConfig
    from sepi_tpu.data.manifest import Dataset, Trial, Utterance
    from sepi_tpu.recipes.pipeline import backend_eval

    dim, num_spk, utts = 12, 20, 6
    x, labels = _synth(rng, num_spk=num_spk, utts=utts, dim=dim)
    embs, ds_utts = {}, []
    for i, (v, lab) in enumerate(zip(x, labels)):
        u = f"spk{lab}_u{i}"
        embs[u] = v.astype(np.float32)
        ds_utts.append(Utterance(u, f"spk{lab}"))
    train = Dataset(ds_utts, "train")
    # eval on held-in utterances (parity of the two paths is the point)
    spk2utt = train.spk2utt
    enroll = {s: us[:2] for s, us in spk2utt.items()}
    trials = [
        Trial(s, u, target=(train[u].spk_id == s))
        for s in list(spk2utt)[:8]
        for us in [spk2utt]
        for u in [uu for ss in list(spk2utt)[:8] for uu in spk2utt[ss][2:4]]
    ]
    host, ah = backend_eval(embs, train, trials, enroll,
                            BackendConfig(lda_dim=8))
    dev, ad = backend_eval(embs, train, trials, enroll,
                           BackendConfig(lda_dim=8, device_scoring=True))
    assert host.eer == pytest.approx(dev.eer, abs=2e-3)
    hs = np.array([ah["scores"][k] for k in sorted(ah["scores"])])
    dsc = np.array([ad["scores"][k] for k in sorted(ad["scores"])])
    scale = np.abs(hs).max()
    np.testing.assert_allclose(dsc, hs, atol=2e-3 * scale, rtol=2e-3)
