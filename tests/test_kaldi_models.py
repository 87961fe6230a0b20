"""Classical trained-artifact interop (utils/kaldi_models.py).

Covers the v1/backend migration surface: final.dubm / final.ubm /
final.ie / plda / mean.vec / transform.mat (reference artifacts of
`egs/sre/v1/run_sre10.sh:89-160`).  Fixture bytes are built with an
INDEPENDENT minimal writer in this file (raw struct.pack, not the
module's _Writer) so reader and writer are not tested against
themselves, and the i-vector mapping is checked against an independent
numpy implementation of the Kaldi-side posterior.
"""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

from sepi_tpu.backend.plda import Plda, plda_score_matrix, train_plda
from sepi_tpu.classical.gmm import DiagGmm, FullGmm
from sepi_tpu.classical.ivector import (
    IvectorStats, extract_ivectors, init_extractor,
    posterior_ivectors,
)
from sepi_tpu.utils import kaldi_models as km


# ---------------------------------------------------------------------------
# independent byte-level builders (the Kaldi wire format, written by hand)
# ---------------------------------------------------------------------------

def _tok(t):
    return t.encode() + b" "


def _i32(v):
    return b"\x04" + struct.pack("<i", v)


def _f64(v):
    return b"\x08" + struct.pack("<d", v)


def _vec(x, double=False):
    x = np.asarray(x, np.float64 if double else np.float32)
    return _tok("DV" if double else "FV") + _i32(x.shape[0]) + x.tobytes()


def _mat(x, double=False):
    x = np.asarray(x, np.float64 if double else np.float32)
    return (_tok("DM" if double else "FM") + _i32(x.shape[0])
            + _i32(x.shape[1]) + x.tobytes())


def _packed(x, double=False):
    x = np.asarray(x, np.float64 if double else np.float32)
    il = np.tril_indices(x.shape[0])
    return _tok("DP" if double else "FP") + _i32(x.shape[0]) + x[il].tobytes()


def _write(path, body):
    path.write_bytes(b"\x00B" + body)


def _rand_spd(rng, d, scale=1.0):
    a = rng.normal(size=(d, d))
    return scale * (a @ a.T + d * np.eye(d))


# ---------------------------------------------------------------------------
# DiagGmm
# ---------------------------------------------------------------------------

def test_diag_ubm_fixture_bytes(tmp_path):
    """Hand-built final.dubm with known parameters reads back exactly."""
    weights = np.array([0.25, 0.75])
    means = np.array([[1.0, -2.0, 0.5], [0.0, 3.0, -1.0]])
    vars_ = np.array([[1.0, 2.0, 0.5], [4.0, 1.0, 2.0]])
    inv_vars = 1.0 / vars_
    gconsts = np.zeros(2)  # reader ignores gconsts (recomputed natively)
    body = (_tok("<DiagGMM>") + _tok("<GCONSTS>") + _vec(gconsts)
            + _tok("<WEIGHTS>") + _vec(weights)
            + _tok("<MEANS_INVVARS>") + _mat(means * inv_vars)
            + _tok("<INV_VARS>") + _mat(inv_vars) + _tok("</DiagGMM>"))
    p = tmp_path / "final.dubm"
    _write(p, body)
    assert km.sniff_kaldi_object(str(p)) == "diag_ubm"
    g = km.read_diag_ubm(str(p))
    np.testing.assert_allclose(np.asarray(g.weights), weights, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.means), means, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g.vars), vars_, rtol=1e-5)
    # semantic: per-component log p(x,k) against a direct computation
    x = np.array([[0.3, -1.0, 2.0]])
    ll = np.asarray(g.log_likes(jnp.asarray(x, jnp.float32)))
    for k in range(2):
        want = (np.log(weights[k]) - 0.5 * (3 * np.log(2 * np.pi)
                + np.sum(np.log(vars_[k]))
                + np.sum((x[0] - means[k]) ** 2 / vars_[k])))
        np.testing.assert_allclose(ll[0, k], want, rtol=1e-4)


def test_diag_ubm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    g = DiagGmm(
        jnp.asarray(rng.dirichlet(np.ones(5)), jnp.float32),
        jnp.asarray(rng.normal(size=(5, 8)), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2.0, size=(5, 8)), jnp.float32),
    )
    p = tmp_path / "final.dubm"
    km.write_diag_ubm(str(p), g)
    g2 = km.read_diag_ubm(str(p))
    np.testing.assert_allclose(np.asarray(g2.weights), np.asarray(g.weights),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.vars), np.asarray(g.vars),
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# FullGmm
# ---------------------------------------------------------------------------

def test_full_ubm_fixture_and_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    k, d = 3, 4
    weights = rng.dirichlet(np.ones(k))
    means = rng.normal(size=(k, d))
    covars = np.stack([_rand_spd(rng, d, 0.5) for _ in range(k)])
    # hand-built file stores the natural parameters
    inv_covars = np.stack([np.linalg.inv(c) for c in covars])
    meics = np.stack([inv_covars[i] @ means[i] for i in range(k)])
    body = (_tok("<FullGMM>") + _tok("<GCONSTS>") + _vec(np.zeros(k))
            + _tok("<WEIGHTS>") + _vec(weights)
            + _tok("<MEANS_INVCOVARS>") + _mat(meics)
            + _tok("<INV_COVARS>"))
    for i in range(k):
        body += _packed(inv_covars[i])
    body += _tok("</FullGMM>")
    p = tmp_path / "final.ubm"
    _write(p, body)
    assert km.sniff_kaldi_object(str(p)) == "full_ubm"
    g = km.read_full_ubm(str(p))
    np.testing.assert_allclose(np.asarray(g.means), means, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g.covars), covars, rtol=1e-3,
                               atol=1e-4)
    # write -> read round trip preserves the model (float32 storage)
    p2 = tmp_path / "rt.ubm"
    km.write_full_ubm(str(p2), g)
    g2 = km.read_full_ubm(str(p2))
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2.covars), np.asarray(g.covars),
                               rtol=1e-3, atol=1e-4)
    # semantic: log-likes of imported model match the source parameters
    x = jnp.asarray(rng.normal(size=(6, d)), jnp.float32)
    ref = FullGmm(jnp.asarray(weights, jnp.float32),
                  jnp.asarray(means, jnp.float32),
                  jnp.asarray(covars, jnp.float32))
    np.testing.assert_allclose(np.asarray(g.log_likes(x)),
                               np.asarray(ref.log_likes(x)),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# IvectorExtractor
# ---------------------------------------------------------------------------

def _fake_kaldi_ie(tmp_path, rng, k=3, d=4, m=2, offset=100.0):
    """Hand-write a Kaldi-origin final.ie; return (path, M, SigmaInv)."""
    m_arr = rng.normal(size=(k, d, m))
    sigma_inv = np.stack([np.linalg.inv(_rand_spd(rng, d, 0.3))
                          for _ in range(k)])
    w_vec = rng.dirichlet(np.ones(k))
    body = (_tok("<IvectorExtractor>") + _tok("<w>") + _mat(np.zeros((0, 0)),
                                                            double=True)
            + _tok("<w_vec>") + _vec(w_vec, double=True)
            + _tok("<M>") + _i32(k))
    for i in range(k):
        body += _mat(m_arr[i], double=True)
    body += _tok("<SigmaInv>")
    for i in range(k):
        body += _packed(sigma_inv[i], double=True)
    body += _tok("<IvectorOffset>") + _f64(offset)
    body += _tok("</IvectorExtractor>")
    p = tmp_path / "final.ie"
    _write(p, body)
    return p, m_arr, sigma_inv, w_vec


def test_ivector_extractor_import_matches_kaldi_math(tmp_path):
    """Imported extractor's i-vectors == independent numpy Kaldi posterior.

    Kaldi: w_post = L^-1 (offset*e1 + sum_k M' SigmaInv F_k),
    L = I + sum_k N_k M' SigmaInv M; written ivector = w_post - offset*e1
    (ivector-extract subtracts PriorOffset from coordinate 0)."""
    rng = np.random.default_rng(2)
    k, d, m, offset = 3, 4, 2, 100.0
    p, m_arr, sigma_inv, _ = _fake_kaldi_ie(tmp_path, rng, k, d, m, offset)
    assert km.sniff_kaldi_object(str(p)) == "ivector_extractor"
    ext, meta = km.read_ivector_extractor(str(p))
    assert meta.prior_offset == pytest.approx(offset)
    assert ext.ivector_dim == m

    # one utterance of fabricated zero/first-order stats
    n = rng.uniform(1.0, 5.0, size=k)
    f_raw = rng.normal(size=(k, d)) * n[:, None]  # sum_t gamma_tk x_t

    # independent Kaldi-side posterior
    l_mat = np.eye(m)
    rhs = np.zeros(m)
    rhs_prior = np.zeros(m)
    rhs_prior[0] = offset
    for i in range(k):
        msm = m_arr[i].T @ sigma_inv[i] @ m_arr[i]
        l_mat += n[i] * msm
        rhs += m_arr[i].T @ sigma_inv[i] @ f_raw[i]
    w_post = np.linalg.solve(l_mat, rhs_prior + rhs)
    kaldi_ivector = w_post.copy()
    kaldi_ivector[0] -= offset

    # our side: whitened centered stats through the imported extractor
    whit = np.asarray(ext.whitener, np.float64)
    means = np.asarray(ext.means, np.float64)
    f_cent = f_raw - n[:, None] * means
    f_white = np.einsum("kde,ke->kd", whit, f_cent)
    stats = IvectorStats(jnp.asarray(n[None], jnp.float32),
                         jnp.asarray(f_white[None], jnp.float32))
    ours, _ = posterior_ivectors(ext, stats)
    np.testing.assert_allclose(np.asarray(ours)[0], kaldi_ivector,
                               rtol=2e-3, atol=2e-3)


def test_ivector_extractor_exact_roundtrip(tmp_path):
    """Kaldi-origin model: export detects the mean/column-0 tie and
    round-trips exactly (same ivector dim, same offset)."""
    rng = np.random.default_rng(3)
    p, m_arr, sigma_inv, w_vec = _fake_kaldi_ie(tmp_path, rng)
    ext, meta = km.read_ivector_extractor(str(p))
    p2 = tmp_path / "rt.ie"
    out_meta = km.write_ivector_extractor(str(p2), ext, meta)
    assert not out_meta.mean_column_added
    assert out_meta.prior_offset == pytest.approx(meta.prior_offset, rel=1e-3)
    ext2, meta2 = km.read_ivector_extractor(str(p2))
    assert ext2.ivector_dim == ext.ivector_dim
    np.testing.assert_allclose(np.asarray(ext2.t), np.asarray(ext.t),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ext2.means), np.asarray(ext.means),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(meta2.w_vec, w_vec, rtol=1e-6)


def test_native_extractor_export_pads_mean_column(tmp_path):
    """A natively-initialized extractor (means independent of T) exports
    with the mean-carrying extra column; the reimported model reproduces
    our i-vectors in coordinates 1.."""
    rng = np.random.default_rng(4)
    k, d = 4, 5
    covars = np.stack([_rand_spd(rng, d, 0.2) for _ in range(k)])
    ubm = FullGmm(jnp.asarray(rng.dirichlet(np.ones(k)), jnp.float32),
                  jnp.asarray(rng.normal(size=(k, d)), jnp.float32),
                  jnp.asarray(covars, jnp.float32))
    ext = init_extractor(ubm, ivector_dim=3, seed=0)
    p = tmp_path / "native.ie"
    out_meta = km.write_ivector_extractor(str(p), ext)
    assert out_meta.mean_column_added
    ext2, meta2 = km.read_ivector_extractor(str(p))
    assert ext2.ivector_dim == 4
    np.testing.assert_allclose(np.asarray(ext2.means), np.asarray(ext.means),
                               rtol=1e-3, atol=1e-4)

    # i-vectors: coordinates 1.. of the padded model ~= the native ones
    n = rng.uniform(5.0, 20.0, size=(2, k)).astype(np.float32)
    f_white_native = rng.normal(size=(2, k, d)).astype(np.float32)
    stats = IvectorStats(jnp.asarray(n), jnp.asarray(f_white_native))
    iv_native = extract_ivectors(ext, stats)
    # the same raw stats seen through the reimported whitener (equal up to
    # float32 noise, so reuse directly)
    iv_pad = extract_ivectors(ext2, stats)
    np.testing.assert_allclose(iv_pad[:, 1:], iv_native, rtol=5e-2, atol=5e-2)


# ---------------------------------------------------------------------------
# Plda
# ---------------------------------------------------------------------------

def test_plda_fixture_roundtrip_and_scores(tmp_path):
    rng = np.random.default_rng(5)
    dim, n_spk, n_utt = 6, 12, 8
    vecs, labels = [], []
    for s in range(n_spk):
        c = rng.normal(size=dim) * 2.0
        for _ in range(n_utt):
            vecs.append(c + rng.normal(size=dim))
            labels.append(s)
    vecs = np.asarray(vecs)
    pl = train_plda(vecs, labels, num_iters=3)

    # hand-built file bytes (double precision like Kaldi)
    body = (_tok("<Plda>") + _vec(pl.mean, double=True)
            + _mat(pl.transform, double=True) + _vec(pl.psi, double=True)
            + _tok("</Plda>"))
    p = tmp_path / "plda"
    _write(p, body)
    assert km.sniff_kaldi_object(str(p)) == "plda"
    pl2 = km.read_plda(str(p))
    np.testing.assert_allclose(pl2.mean, pl.mean, rtol=1e-12)
    np.testing.assert_allclose(pl2.transform, pl.transform, rtol=1e-12)
    np.testing.assert_allclose(pl2.psi, pl.psi, rtol=1e-12)

    # module writer -> reader round trip preserves trial scores exactly
    p3 = tmp_path / "plda_rt"
    km.write_plda(str(p3), pl)
    pl3 = km.read_plda(str(p3))
    enroll, test = vecs[:5], vecs[5:15]
    s_a = plda_score_matrix(pl, enroll, test)
    s_b = plda_score_matrix(pl3, enroll, test)
    np.testing.assert_allclose(s_b, s_a, rtol=1e-12)


# ---------------------------------------------------------------------------
# bare vector/matrix files + sniffing + error paths
# ---------------------------------------------------------------------------

def test_vector_matrix_files(tmp_path):
    rng = np.random.default_rng(6)
    v = rng.normal(size=7)
    m = rng.normal(size=(3, 5))
    pv, pm = tmp_path / "mean.vec", tmp_path / "transform.mat"
    km.write_kaldi_vector_file(str(pv), v)
    km.write_kaldi_matrix_file(str(pm), m)
    assert km.sniff_kaldi_object(str(pv)) == "vector"
    assert km.sniff_kaldi_object(str(pm)) == "matrix"
    np.testing.assert_allclose(km.read_kaldi_vector_file(str(pv)), v,
                               rtol=1e-6)
    np.testing.assert_allclose(km.read_kaldi_matrix_file(str(pm)), m,
                               rtol=1e-6)
    # double-precision storage is exact
    km.write_kaldi_vector_file(str(pv), v, double=True)
    np.testing.assert_allclose(km.read_kaldi_vector_file(str(pv)), v,
                               rtol=1e-15)


def test_sniff_rejects_text_and_unknown(tmp_path):
    p = tmp_path / "text.mdl"
    p.write_bytes(b"<DiagGMM> this is a text-format file")
    with pytest.raises(km.KaldiModelError, match="binary magic"):
        km.sniff_kaldi_object(str(p))
    p2 = tmp_path / "junk"
    p2.write_bytes(b"\x00B<SomethingElse> ")
    with pytest.raises(km.KaldiModelError, match="unrecognized"):
        km.sniff_kaldi_object(str(p2))


def test_wrong_kind_error(tmp_path):
    g = DiagGmm(jnp.asarray([1.0]), jnp.zeros((1, 2)), jnp.ones((1, 2)))
    p = tmp_path / "final.dubm"
    km.write_diag_ubm(str(p), g)
    with pytest.raises(km.KaldiModelError, match="expected <Plda>"):
        km.read_plda(str(p))


# ---------------------------------------------------------------------------
# CLI round trip
# ---------------------------------------------------------------------------

def test_cli_classical_import_export(tmp_path):
    from sepi_tpu.cli import main

    rng = np.random.default_rng(7)
    k, d = 3, 4
    covars = np.stack([_rand_spd(rng, d, 0.4) for _ in range(k)])
    g = FullGmm(jnp.asarray(rng.dirichlet(np.ones(k)), jnp.float32),
                jnp.asarray(rng.normal(size=(k, d)), jnp.float32),
                jnp.asarray(covars, jnp.float32))
    src = tmp_path / "final.ubm"
    km.write_full_ubm(str(src), g)
    out = tmp_path / "imported"
    assert main(["import-kaldi", "--raw", str(src), "--out", str(out)]) == 0
    z = np.load(out / "model.npz")
    assert str(z["kind"]) == "full_ubm"
    back = tmp_path / "back.ubm"
    assert main(["export-kaldi", "--model", str(out / "model.npz"),
                 "--out", str(back)]) == 0
    g2 = km.read_full_ubm(str(back))
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means),
                               rtol=1e-3, atol=1e-4)


def test_truncation_fuzz_never_crashes(tmp_path):
    """Every truncation of every artifact raises a clean ValueError
    subclass (the nnet3 reader's hardening contract, applied here)."""
    rng = np.random.default_rng(8)
    g = DiagGmm(jnp.asarray(rng.dirichlet(np.ones(3)), jnp.float32),
                jnp.asarray(rng.normal(size=(3, 4)), jnp.float32),
                jnp.asarray(rng.uniform(0.5, 2.0, (3, 4)), jnp.float32))
    covars = np.stack([_rand_spd(rng, 4, 0.4) for _ in range(3)])
    fg = FullGmm(g.weights, g.means, jnp.asarray(covars, jnp.float32))
    ext = init_extractor(fg, ivector_dim=2, seed=0)
    pl = Plda(rng.normal(size=4), np.linalg.qr(rng.normal(size=(4, 4)))[0],
              rng.uniform(0.1, 2.0, 4))

    files = {}
    km.write_diag_ubm(str(tmp_path / "d"), g)
    km.write_full_ubm(str(tmp_path / "f"), fg)
    km.write_ivector_extractor(str(tmp_path / "i"), ext)
    km.write_plda(str(tmp_path / "p"), pl)
    files = {"d": km.read_diag_ubm, "f": km.read_full_ubm,
             "i": km.read_ivector_extractor, "p": km.read_plda}

    for name, reader in files.items():
        data = (tmp_path / name).read_bytes()
        # up to len-2: dropping ONLY the final token's trailing space
        # still parses completely (correctly so)
        cuts = sorted({1, 2, 3, 7} | set(
            int(x) for x in np.linspace(4, len(data) - 2, 40)))
        for cut in cuts:
            trunc = tmp_path / f"{name}.trunc"
            trunc.write_bytes(data[:cut])
            with pytest.raises(ValueError):
                reader(str(trunc))


def test_corruption_fuzz_never_crashes(tmp_path):
    """Random byte flips either parse (flip hit payload data) or raise a
    clean ValueError — never segfault/hang/assert."""
    rng = np.random.default_rng(9)
    covars = np.stack([_rand_spd(rng, 4, 0.4) for _ in range(3)])
    fg = FullGmm(jnp.asarray(rng.dirichlet(np.ones(3)), jnp.float32),
                 jnp.asarray(rng.normal(size=(3, 4)), jnp.float32),
                 jnp.asarray(covars, jnp.float32))
    km.write_full_ubm(str(tmp_path / "f"), fg)
    data = bytearray((tmp_path / "f").read_bytes())
    for trial in range(60):
        corrupt = bytearray(data)
        for _ in range(3):
            corrupt[rng.integers(0, len(data))] = rng.integers(0, 256)
        p = tmp_path / "f.bad"
        p.write_bytes(bytes(corrupt))
        try:
            km.read_full_ubm(str(p))
        except (ValueError, np.linalg.LinAlgError):
            pass

@pytest.mark.slow

def test_driver_run_writes_kaldi_artifacts(tmp_path):
    """run_v1(export_kaldi=True) leaves the reference exp-dir artifact
    set: backend/{mean.vec, transform.mat, plda} + kaldi/{final.ubm,
    final.ie}, all readable by the interop layer."""
    from sepi_tpu.config import IvectorConfig, UbmConfig
    from sepi_tpu.data import make_synthetic_corpus
    from sepi_tpu.recipes.drivers import run_v1

    corpus = make_synthetic_corpus(num_speakers=6, utts_per_speaker=4,
                                   seed=3, duration_sec=1.5)
    enroll = {s: us[:2] for s, us in corpus.dataset.spk2utt.items()}
    res = run_v1(
        corpus.dataset, corpus.audio, corpus.audio, corpus.trials, enroll,
        workdir=str(tmp_path), export_kaldi=True,
        ubm_cfg=UbmConfig(num_gauss=8, num_gselect=8, full_gselect=8,
                          num_iters_init=2, num_iters_full=1, subsample=4),
        iv_cfg=IvectorConfig(ivector_dim=8, num_iters=2),
    )
    ubm = km.read_full_ubm(str(tmp_path / "kaldi" / "final.ubm"))
    ext, meta = km.read_ivector_extractor(str(tmp_path / "kaldi" / "final.ie"))
    assert ubm.num_comp == 8 and ext.ivector_dim in (8, 9)
    pl = km.read_plda(str(tmp_path / "backend" / "plda"))
    mean = km.read_kaldi_vector_file(str(tmp_path / "backend" / "mean.vec"))
    lda = km.read_kaldi_matrix_file(str(tmp_path / "backend" /
                                        "transform.mat"))
    assert lda.shape[1] == mean.shape[0] and pl.dim == lda.shape[0]


def test_inconsistent_component_counts_raise_cleanly(tmp_path):
    """5 weights but 3 mean rows -> KaldiModelError, not IndexError."""
    rng = np.random.default_rng(10)
    k, d = 3, 4
    inv_covars = np.stack([np.linalg.inv(_rand_spd(rng, d, 0.5))
                           for _ in range(k)])
    meics = np.stack([inv_covars[i] @ rng.normal(size=d) for i in range(k)])
    body = (_tok("<FullGMM>") + _tok("<GCONSTS>") + _vec(np.zeros(5))
            + _tok("<WEIGHTS>") + _vec(rng.dirichlet(np.ones(5)))
            + _tok("<MEANS_INVCOVARS>") + _mat(meics)
            + _tok("<INV_COVARS>"))
    for i in range(k):
        body += _packed(inv_covars[i])
    body += _tok("</FullGMM>")
    p = tmp_path / "bad.ubm"
    _write(p, body)
    with pytest.raises(km.KaldiModelError, match="weights but 3"):
        km.read_full_ubm(str(p))


def test_use_weights_extractor_warns(tmp_path):
    """A --use-weights=true final.ie (nonempty <w>) imports with a
    warning about the unmodeled weight-refinement term."""
    rng = np.random.default_rng(11)
    k, d, m = 3, 4, 2
    m_arr = rng.normal(size=(k, d, m))
    sigma_inv = np.stack([np.linalg.inv(_rand_spd(rng, d, 0.3))
                          for _ in range(k)])
    body = (_tok("<IvectorExtractor>") + _tok("<w>")
            + _mat(rng.normal(size=(k, m)), double=True)
            + _tok("<w_vec>") + _vec(np.zeros(0), double=True)
            + _tok("<M>") + _i32(k))
    for i in range(k):
        body += _mat(m_arr[i], double=True)
    body += _tok("<SigmaInv>")
    for i in range(k):
        body += _packed(sigma_inv[i], double=True)
    body += _tok("<IvectorOffset>") + _f64(100.0)
    body += _tok("</IvectorExtractor>")
    p = tmp_path / "w.ie"
    _write(p, body)
    with pytest.warns(UserWarning, match="use-weights"):
        ext, meta = km.read_ivector_extractor(str(p))
    assert meta.w.shape == (3, 2)


def test_cli_vector_matrix_import_export(tmp_path):
    from sepi_tpu.cli import main

    rng = np.random.default_rng(12)
    v = rng.normal(size=9)
    src = tmp_path / "mean.vec"
    km.write_kaldi_vector_file(str(src), v, double=True)
    out = tmp_path / "imp"
    assert main(["import-kaldi", "--raw", str(src), "--out", str(out)]) == 0
    z = np.load(out / "model.npz")
    np.testing.assert_allclose(z["data"], v, rtol=1e-12)
    back = tmp_path / "back.vec"
    assert main(["export-kaldi", "--model", str(out / "model.npz"),
                 "--out", str(back)]) == 0
    np.testing.assert_allclose(km.read_kaldi_vector_file(str(back)), v,
                               rtol=1e-12)
