"""Corpus ingestion and Kaldi data-dir interop tests."""

import os

import numpy as np
import pytest

from sepi_tpu.data import (
    dataset_from_kaldi_dir,
    dataset_from_table,
    dataset_from_wav_tree,
    write_kaldi_dir,
    write_wav,
)
from sepi_tpu.ops import paste_features, subsample_frames

import jax.numpy as jnp


def test_dataset_from_table_and_meta():
    ds = dataset_from_table(
        [("u1", "s1", "/x/u1.wav"), ("u2", "s2", "/x/u2.wav")],
        meta={"u1": {"gender": "f"}},
    )
    assert ds["u1"].get_meta("gender") == "f"
    assert ds["u2"].get_meta("gender") is None


def test_wav_tree_walk(tmp_path, rng):
    for spk in ("alice", "bob"):
        d = tmp_path / spk
        d.mkdir()
        for i in range(2):
            write_wav(str(d / f"{i}.wav"), rng.normal(size=100) * 100, 8000)
    ds = dataset_from_wav_tree(str(tmp_path))
    assert len(ds) == 4
    assert set(ds.speakers) == {"alice", "bob"}


def test_kaldi_dir_roundtrip(tmp_path):
    ds = dataset_from_table(
        [("u1", "s1", "/x/u1.wav"), ("u2", "s1", "/x/u2.wav")]
    ).map(lambda u: u.replace(num_frames=500, uniq_id="u0"))
    out = str(tmp_path / "data")
    write_kaldi_dir(ds, out)
    back = dataset_from_kaldi_dir(out)
    assert back.utt_ids == ["u1", "u2"]
    assert back["u1"].num_frames == 500
    assert back["u1"].uniq_id == "u0"
    assert back.spk2utt == {"s1": ["u1", "u2"]}


def test_kaldi_dir_pipelines(tmp_path):
    # sph2pipe pipes (the reference's wav.scp convention) parse natively;
    # arbitrary other pipelines are still rejected.
    d = tmp_path / "k"
    d.mkdir()
    (d / "wav.scp").write_text("u1 sph2pipe -f wav -p -c 2 x.sph |\n")
    (d / "utt2spk").write_text("u1 s1\n")
    ds = dataset_from_kaldi_dir(str(d))
    u = next(iter(ds))
    assert u.wav == "x.sph" and u.get_meta("channel") == "2"
    (d / "wav.scp").write_text("u1 flac -c -d x.flac |\n")
    with pytest.raises(ValueError, match="pipeline"):
        dataset_from_kaldi_dir(str(d))


def test_subsample_and_paste(rng):
    x = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    y = subsample_frames(x, 3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[::3])
    z = paste_features([x, x * 2])
    assert z.shape == (10, 8)
    with pytest.raises(ValueError):
        paste_features([x, x[:5]])


def test_featstore_roundtrip(tmp_path, rng):
    from sepi_tpu.data.featstore import FeatStore

    feats = {f"u{i}": rng.normal(size=(10 + i, 4)).astype(np.float32) for i in range(5)}
    store = FeatStore.write(str(tmp_path / "fs"), feats)
    assert set(store) == set(feats)
    for u in feats:
        np.testing.assert_array_equal(np.asarray(store[u]), feats[u])
    reopened = FeatStore.open(str(tmp_path / "fs"))
    np.testing.assert_array_equal(np.asarray(reopened["u3"]), feats["u3"])
    assert len(reopened) == 5 and "u0" in reopened


def test_featstore_feeds_sampler(tmp_path, rng):
    from sepi_tpu.data import ChunkSampler, make_synthetic_corpus
    from sepi_tpu.data.featstore import FeatStore
    from sepi_tpu.config import ChunkConfig

    corpus = make_synthetic_corpus(num_speakers=3, utts_per_speaker=3, duration_sec=2.0)
    feats = {u: rng.normal(size=(120, 8)).astype(np.float32) for u in corpus.dataset.utt_ids}
    store = FeatStore.write(str(tmp_path / "fs"), feats)
    sampler = ChunkSampler(store, corpus.dataset, ChunkConfig(min_chunk_len=40, max_chunk_len=60, num_buckets=2), 8)
    b = sampler.sample_batch()
    assert b.feats.shape[0] == 8 and b.feats.shape[2] == 8


def test_prefetch_loader(rng):
    from sepi_tpu.data.featstore import PrefetchLoader

    items = list(range(20))
    out = list(PrefetchLoader(iter(items), depth=3))
    assert out == items

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = PrefetchLoader(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)
        next(it)


def test_trials_save_load_roundtrip(tmp_path):
    from sepi_tpu.data import Trial, load_trials, save_trials

    trials = [Trial("m1", "t1", True), Trial("m2", "t2", False)]
    p = str(tmp_path / "trials")
    save_trials(trials, p)
    back = load_trials(p)
    assert back == trials


def test_segments_ingestion_and_extract(tmp_path, rng):
    """segments-file support (steps/data/augment_data_dir_new.py's reason
    to exist + extract-segments): recordings crop into utterances."""
    from sepi_tpu.data import dataset_from_kaldi_dir, extract_segments
    from sepi_tpu.data.audio import write_wav

    d = tmp_path / "data"
    d.mkdir()
    sr = 8000
    rec_audio = {"recA": rng.normal(size=3 * sr).astype(np.float32) * 100,
                 "recB": rng.normal(size=2 * sr).astype(np.float32) * 100}
    with open(d / "wav.scp", "w") as f:
        for r, x in rec_audio.items():
            p = str(d / f"{r}.wav")
            write_wav(p, x, sr)
            f.write(f"{r} {p}\n")
    with open(d / "segments", "w") as f:
        f.write("spk1-a recA 0.50 1.50\n")
        f.write("spk1-b recA 1.70 2.90\n")
        f.write("spk2-a recB 0.00 1.95\n")
        f.write("spk2-tiny recB 1.00 1.05\n")  # below min length
    with open(d / "utt2spk", "w") as f:
        for u in ["spk1-a", "spk1-b", "spk2-a", "spk2-tiny"]:
            f.write(f"{u} {u.split('-')[0]}\n")

    ds = dataset_from_kaldi_dir(str(d))
    ds.validate()
    u = ds["spk1-a"]
    assert u.recording == "recA" and u.start == 0.5 and u.end == 1.5
    assert abs(u.duration - 1.0) < 1e-6

    out = extract_segments(rec_audio, ds, sr)
    assert set(out) == {"spk1-a", "spk1-b", "spk2-a"}  # tiny one skipped
    np.testing.assert_array_equal(out["spk1-a"], rec_audio["recA"][4000:12000])
    assert len(out["spk2-a"]) == int(1.95 * sr)


def test_extract_segments_overshoot_policy(rng):
    from sepi_tpu.data import extract_segments
    from sepi_tpu.data.manifest import Dataset, Utterance

    sr = 1000
    rec = {"r": rng.normal(size=2000).astype(np.float32)}
    ok = Dataset([Utterance("u1", "s", wav="r", recording="r", start=1.0, end=2.3)])
    out = extract_segments(rec, ok, sr, max_overshoot=0.5)
    assert len(out["u1"]) == 1000  # clamped to recording end
    bad = Dataset([
        Utterance("u1", "s", wav="r", recording="r", start=1.0, end=2.3),
        Utterance("u2", "s", wav="r", recording="r", start=1.0, end=2.8),
        Utterance("u3", "s", wav="missing", recording="missing", start=0.0, end=1.0),
    ])
    # default (extract-segments semantics): warn and skip the bad rows,
    # keep the good ones — one malformed segments row must not abort the
    # whole corpus load
    warnings = []
    out = extract_segments(rec, bad, sr, max_overshoot=0.5, log=warnings.append)
    assert set(out) == {"u1"}
    assert any("u2" in w for w in warnings) and any("u3" in w for w in warnings)
    # strict: raise
    with pytest.raises(ValueError, match="overshoot"):
        extract_segments(rec, bad.subset(["u2"]), sr, max_overshoot=0.5,
                         strict=True)
    with pytest.raises(KeyError, match="missing"):
        extract_segments(rec, bad.subset(["u3"]), sr, strict=True)


def test_validate_rejects_bad_segment():
    from sepi_tpu.data.manifest import Dataset, Utterance

    ds = Dataset([Utterance("u", "s", wav="w", start=2.0, end=1.0)])
    with pytest.raises(ValueError, match="segment"):
        ds.validate()
