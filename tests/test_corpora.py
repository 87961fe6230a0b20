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


def test_kaldi_dir_rejects_pipelines(tmp_path):
    d = tmp_path / "k"
    d.mkdir()
    (d / "wav.scp").write_text("u1 sph2pipe -f wav x.sph |\n")
    (d / "utt2spk").write_text("u1 s1\n")
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
