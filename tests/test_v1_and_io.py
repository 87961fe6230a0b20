"""v1 i-vector recipe e2e, native ark/scp I/O, audio ingest, score norm."""

import os
import struct

import numpy as np
import pytest

from sepi_tpu.backend import s_norm, t_norm, z_norm
from sepi_tpu.config import IvectorConfig, UbmConfig
from sepi_tpu.data import make_synthetic_corpus
from sepi_tpu.data.audio import AudioStore, read_wav, write_wav
from sepi_tpu.metrics import evaluate_scores
from sepi_tpu.recipes.ivector_recipe import (
    extract_v1_ivectors,
    prepare_features_ivector,
    train_v1_frontend,
)
from sepi_tpu.recipes.pipeline import backend_eval
from sepi_tpu.utils import ArkWriter, read_int_vector, read_matrix, read_scp, read_vector
from sepi_tpu.utils.kaldi_io import read_vector as _rv


# ------------------------------------------------------------- v1 recipe


@pytest.fixture(scope="module")
def v1_world():
    # i-vectors need more audio than the neural models to separate the
    # synthetic speakers (sliding CMVN strips most of the timbre mean);
    # 6 s utterances + 64 Gaussians gives a stable margin.
    corpus = make_synthetic_corpus(
        num_speakers=6, utts_per_speaker=5, duration_sec=6.0, seed=77
    )
    feats = prepare_features_ivector(corpus.audio)
    return corpus, feats


def test_v1_features_have_deltas(v1_world):
    corpus, feats = v1_world
    f = next(iter(feats.values()))
    assert f.shape[1] == 60  # 20 MFCC + delta + delta-delta


def test_v1_ivector_recipe_e2e(v1_world):
    corpus, feats = v1_world
    ubm_cfg = UbmConfig(
        num_gauss=64, num_gselect=8, full_gselect=8,
        num_iters_init=6, num_iters_full=3, subsample=4,
    )
    iv_cfg = IvectorConfig(ivector_dim=16, num_iters=4)
    ubm, ext = train_v1_frontend(feats, ubm_cfg, iv_cfg, seed=0)
    ivecs = extract_v1_ivectors(ubm, ext, feats, iv_cfg, num_gselect=8)
    assert set(ivecs) == set(feats)

    enroll = {s: us[:1] for s, us in corpus.dataset.spk2utt.items()}
    res, _ = backend_eval(ivecs, corpus.dataset, corpus.trials, enroll)
    assert res.eer < 0.2, f"v1 EER {res.eer:.3f}"


def test_v1_dnn_posterior_variant(v1_world):
    """DNN-posterior UBM: posteriors supplied externally."""
    corpus, feats = v1_world
    from sepi_tpu.classical.gmm import gselect_posteriors, init_diag_from_frames

    import jax.numpy as jnp

    all_frames = np.concatenate(list(feats.values()))
    proto = init_diag_from_frames(all_frames[::10], 16, seed=2)

    def posterior_fn(frames):
        return np.asarray(
            gselect_posteriors(proto.log_likes(jnp.asarray(frames)), 8)
        )

    ubm, ext = train_v1_frontend(
        feats,
        UbmConfig(num_gauss=16, full_gselect=8),
        IvectorConfig(ivector_dim=6, num_iters=2),
        posterior_fn=posterior_fn,
    )
    ivecs = extract_v1_ivectors(ubm, ext, feats, IvectorConfig(ivector_dim=6), 8)
    assert all(np.all(np.isfinite(v)) for v in ivecs.values())


# ---------------------------------------------------------- kaldi ark IO


def test_ark_roundtrip_matrix(tmp_path, rng):
    ark = str(tmp_path / "x.ark")
    scp = str(tmp_path / "x.scp")
    mats = {f"utt{i}": rng.normal(size=(5 + i, 7)).astype(np.float32) for i in range(3)}
    with ArkWriter(ark, scp) as w:
        for k, m in mats.items():
            w.put_matrix(k, m)
    table = dict(read_scp(scp))
    assert set(table) == set(mats)
    for k, (path, off) in table.items():
        np.testing.assert_array_equal(read_matrix(path, off), mats[k])


def test_ark_bytes_match_kaldi_format(tmp_path):
    """Byte-level check of the FM layout against the documented format."""
    ark = str(tmp_path / "y.ark")
    m = np.arange(6, dtype=np.float32).reshape(2, 3)
    with ArkWriter(ark) as w:
        w.put_matrix("k1", m)
    raw = open(ark, "rb").read()
    expect = (
        b"k1 \x00BFM "
        + b"\x04" + struct.pack("<i", 2)
        + b"\x04" + struct.pack("<i", 3)
        + m.tobytes()
    )
    assert raw == expect


def test_ark_roundtrip_vectors(tmp_path, rng):
    ark = str(tmp_path / "v.ark")
    scp = str(tmp_path / "v.scp")
    vec = rng.normal(size=11).astype(np.float32)
    ivec = rng.integers(0, 4000, size=23).astype(np.int32)
    with ArkWriter(ark, scp) as w:
        w.put_vector("fv", vec)
        w.put_int_vector("iv", ivec)
    table = dict(read_scp(scp))
    np.testing.assert_array_equal(read_vector(*table["fv"]), vec)
    np.testing.assert_array_equal(read_int_vector(*table["iv"]), ivec)


def test_read_compressed_matrix(tmp_path):
    """Construct CompressedMatrix (format 1) bytes per the Kaldi layout
    and check decompression."""
    rows, cols = 8, 2
    rng = np.random.default_rng(5)
    data = rng.uniform(-1, 1, size=(rows, cols)).astype(np.float32)
    mn, rg = float(data.min()), float(data.max() - data.min()) or 1.0

    def to_u16(v):
        return int(np.clip(round((v - mn) / rg * 65535), 0, 65535))

    payload = b"cm \x00BCM " + struct.pack("<ffii", mn, rg, rows, cols)
    col_headers = b""
    col_bytes = b""
    uppers = []
    for c in range(cols):
        col = np.sort(data[:, c])
        p0, p25, p75, p100 = (
            to_u16(col[0]), to_u16(col[2]), to_u16(col[5]), to_u16(col[7]),
        )
        col_headers += struct.pack("<HHHH", p0, p25, p75, p100)
        f0, f25, f75, f100 = (mn + rg * p / 65535 for p in (p0, p25, p75, p100))
        bs = []
        for r in range(rows):
            v = data[r, c]
            if v < f25:
                b = 0 if f25 == f0 else round((v - f0) / (f25 - f0) * 64)
            elif v < f75:
                b = 64 + round((v - f25) / (f75 - f25) * 128)
            else:
                b = 192 if f100 == f75 else 192 + round((v - f75) / (f100 - f75) * 63)
            bs.append(int(np.clip(b, 0, 255)))
        col_bytes += bytes(bs)
        uppers.append((f0, f25, f75, f100))
    ark = str(tmp_path / "c.ark")
    open(ark, "wb").write(payload + col_headers + col_bytes)
    out = read_matrix(ark, 3)
    # 8-bit quantization: tolerance is a few percent of the range
    np.testing.assert_allclose(out, data, atol=rg * 0.03)


def test_read_matrix_errors(tmp_path):
    p = str(tmp_path / "bad.ark")
    open(p, "wb").write(b"garbage")
    with pytest.raises(IOError):
        read_matrix(p, 0)
    with pytest.raises(IOError):
        read_matrix(str(tmp_path / "missing.ark"), 0)


# -------------------------------------------------------------- audio IO


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.normal(size=4000) * 1000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 8000)
    y, rate = read_wav(p)
    assert rate == 8000
    np.testing.assert_allclose(y, np.round(np.clip(x, -32768, 32767)), atol=0.51)


def test_audio_store_schemes(tmp_path, rng):
    store = AudioStore()
    pool = {"u1": rng.normal(size=100).astype(np.float32)}
    store.register_pool("synth", pool)
    np.testing.assert_array_equal(store.load("synth:u1"), pool["u1"])
    with pytest.raises(KeyError):
        store.load("unknown:u1")
    x = (rng.normal(size=500) * 500).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 8000)
    assert store.load(p, 8000).shape == (500,)
    with pytest.raises(ValueError):
        store.load(p, 16000)


# ------------------------------------------------------------ score norm


def test_score_norm_invariants(rng):
    m, n, c = 4, 5, 50
    scores = rng.normal(size=(m, n))
    ec = rng.normal(size=(m, c)) * 2 + 1
    tc = rng.normal(size=(n, c)) * 3 - 1
    z = z_norm(scores, ec)
    t = t_norm(scores, tc)
    s = s_norm(scores, ec, tc)
    np.testing.assert_allclose(s, 0.5 * (z + t))
    # z-norm of the cohort scores themselves has ~zero mean/unit std rows
    zc = z_norm(ec, ec)
    np.testing.assert_allclose(zc.mean(axis=1), 0, atol=1e-10)
    np.testing.assert_allclose(zc.std(axis=1), 1, atol=1e-6)
    # adaptive top-k selects the highest cohort scores
    s_top = s_norm(scores, ec, tc, top_k=10)
    assert s_top.shape == scores.shape


def test_s_norm_improves_shifted_cohort(rng):
    """Per-model score offsets (the classic z-norm use case) are removed."""
    m, n = 10, 200
    offs = rng.normal(size=m) * 5
    base_tgt = rng.normal(1.5, 1, size=(m, n // 2))
    base_non = rng.normal(-1.5, 1, size=(m, n // 2))
    tgt = base_tgt + offs[:, None]
    non = base_non + offs[:, None]
    cohort = rng.normal(0, 1, size=(m, 100)) + offs[:, None]
    raw = evaluate_scores(tgt.ravel(), non.ravel()).eer
    zt = z_norm(tgt, cohort)
    zn = z_norm(non, cohort)
    normed = evaluate_scores(zt.ravel(), zn.ravel()).eer
    assert normed < raw


def test_compressed_matrix_write_read_roundtrip(tmp_path, rng):
    """Native CM writer -> native CM reader, ~8-bit accuracy."""
    ark = str(tmp_path / "cm.ark")
    scp = str(tmp_path / "cm.scp")
    m = (rng.normal(size=(50, 13)) * 5 + 2).astype(np.float32)
    const_col = np.full((50, 1), 3.25, np.float32)  # degenerate column
    m = np.concatenate([m, const_col], axis=1)
    with ArkWriter(ark, scp) as w:
        w.put_compressed_matrix("utt", m)
    table = dict(read_scp(scp))
    out = read_matrix(*table["utt"])
    assert out.shape == m.shape
    rg = float(m.max() - m.min())
    np.testing.assert_allclose(out, m, atol=rg * 0.05)
    # constant column survives the strictly-increasing percentile guard
    np.testing.assert_allclose(out[:, -1], 3.25, atol=rg * 0.02)


def test_read_compressed_matrix_formats_2_and_3(tmp_path):
    """CM2 (uint16, kTwoByte) and CM3 (uint8, kOneByte) bytes built per
    the Kaldi layout decode correctly (global header, row-major data,
    linear dequantization)."""
    rng = np.random.default_rng(9)
    data = rng.uniform(-2, 3, size=(5, 4)).astype(np.float32)
    mn, rg = float(data.min()), float(data.max() - data.min())

    q16 = np.clip(np.round((data - mn) / rg * 65535), 0, 65535).astype("<u2")
    raw2 = (b"k \x00BCM2 " + struct.pack("<ffii", mn, rg, 5, 4) + q16.tobytes())
    p2 = str(tmp_path / "cm2.ark")
    open(p2, "wb").write(raw2)
    out2 = read_matrix(p2, 2)
    np.testing.assert_allclose(out2, data, atol=rg / 65535 * 1.01)

    q8 = np.clip(np.round((data - mn) / rg * 255), 0, 255).astype(np.uint8)
    raw3 = (b"k \x00BCM3 " + struct.pack("<ffii", mn, rg, 5, 4) + q8.tobytes())
    p3 = str(tmp_path / "cm3.ark")
    open(p3, "wb").write(raw3)
    out3 = read_matrix(p3, 2)
    np.testing.assert_allclose(out3, data, atol=rg / 255 * 1.01)


def test_compressed_matrix2_write_read_roundtrip(tmp_path, rng):
    ark = str(tmp_path / "c2.ark")
    scp = str(tmp_path / "c2.scp")
    m = rng.normal(size=(30, 23)).astype(np.float32) * 4
    with ArkWriter(ark, scp) as w:
        w.put_compressed_matrix2("u1", m)
    table = dict(read_scp(scp))
    out = read_matrix(*table["u1"])
    rg = float(m.max() - m.min())
    np.testing.assert_allclose(out, m, atol=rg / 65535 * 1.5)
    # the on-disk token really is CM2 (Kaldi-readable)
    raw = open(ark, "rb").read()
    assert b"\x00BCM2 " in raw


def test_gzipped_alignment_archives(tmp_path, rng):
    """ali.N.gz ingestion (steps/align_fmllr.sh output form): write binary
    int-vector arks, gzip them as Kaldi pipelines do, read back merged."""
    import gzip

    from sepi_tpu.utils import read_ali_ark, read_ali_dir

    alis = {f"utt{i:02d}": rng.integers(0, 4000, size=50 + i).astype(np.int32)
            for i in range(6)}
    keys = sorted(alis)
    for j in range(2):  # two job shards, like run.pl JOB=1:2
        ark = str(tmp_path / f"ali.tmp{j}")
        with ArkWriter(ark) as w:
            for k in keys[j::2]:
                w.put_int_vector(k, alis[k])
        with open(ark, "rb") as f, gzip.open(str(tmp_path / f"ali.{j+1}.gz"), "wb") as g:
            g.write(f.read())
    one = read_ali_ark(str(tmp_path / "ali.1.gz"))
    assert set(one) == set(keys[0::2])
    merged = read_ali_dir(str(tmp_path))
    assert set(merged) == set(keys)
    for k in keys:
        np.testing.assert_array_equal(merged[k], alis[k])


def test_ali_ark_rejects_text_format(tmp_path):
    from sepi_tpu.utils import read_ali_ark

    p = str(tmp_path / "ali.txt")
    open(p, "wb").write(b"utt1 1 2 3 4\n")
    with pytest.raises(ValueError, match="binary"):
        read_ali_ark(p)


def test_ingest_real_world_kaldi_artifact_set(tmp_path, rng):
    """VERDICT r1 item 5 'Done' criterion: ingest a fixture set covering
    FM + CM1 + CM2 feats.scp entries and gzipped alignments, via the
    dataset_from_kaldi_dir + feats.scp route."""
    import gzip

    from sepi_tpu.data import dataset_from_kaldi_dir
    from sepi_tpu.data.audio import write_wav
    from sepi_tpu.utils import read_ali_dir, read_feats_scp

    d = tmp_path / "data"
    d.mkdir()
    utts = ["spk1-a", "spk1-b", "spk2-a"]
    feats = {u: (rng.normal(size=(40 + i, 13)) * 3).astype(np.float32)
             for i, u in enumerate(utts)}
    # wav.scp/utt2spk (the data-dir shape) with real little wavs
    with open(d / "wav.scp", "w") as fw, open(d / "utt2spk", "w") as fs:
        for u in utts:
            wp = str(d / f"{u}.wav")
            write_wav(wp, rng.normal(size=800).astype(np.float32) * 100, 8000)
            fw.write(f"{u} {wp}\n")
            fs.write(f"{u} {u.split('-')[0]}\n")
    # feats.ark mixing all three matrix formats
    ark, scp = str(d / "feats.ark"), str(d / "feats.scp")
    with ArkWriter(ark, scp) as w:
        w.put_matrix(utts[0], feats[utts[0]])
        w.put_compressed_matrix(utts[1], feats[utts[1]])
        w.put_compressed_matrix2(utts[2], feats[utts[2]])
    # gzipped alignments
    alis = {u: rng.integers(0, 100, size=feats[u].shape[0]).astype(np.int32)
            for u in utts}
    tmp_ark = str(d / "ali.raw")
    with ArkWriter(tmp_ark) as w:
        for u in utts:
            w.put_int_vector(u, alis[u])
    with open(tmp_ark, "rb") as f, gzip.open(str(d / "ali.1.gz"), "wb") as g:
        g.write(f.read())

    ds = dataset_from_kaldi_dir(str(d))
    assert set(ds.utt_ids) == set(utts)
    got_feats = read_feats_scp(scp)
    got_alis = read_ali_dir(str(d))
    for u in utts:
        assert len(got_alis[u]) == got_feats[u].shape[0]  # frame-aligned
        rg = float(feats[u].max() - feats[u].min())
        np.testing.assert_allclose(got_feats[u], feats[u], atol=rg * 0.03)
        np.testing.assert_array_equal(got_alis[u], alis[u])
