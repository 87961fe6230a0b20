"""Corpus-scale streaming: lazy audio, streaming FeatStore, flat RSS.

VERDICT r4 item 2: the reference streams features from disk
(`local/nnet3/xvector/prepare_feats_for_egs.sh`,
`sid/nnet3/xvector/get_egs_new.sh`) so SRE-scale runs never hold the
corpus in RAM.  These tests pin the equivalents: `AudioStore.
lazy_dataset` (decode-on-access), `FeatStore.write_stream` /
`ArtifactCache.stage_store` (mmap feature artifacts), lazy augmentation
parity, and manifest-digest cache keys that cost zero decodes
(VERDICT r4 item 8).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from sepi_tpu.data.audio import AudioStore, ChainAudio, LazyAudio, write_wav
from sepi_tpu.data.featstore import FeatStore
from sepi_tpu.data.synthetic import make_synthetic_corpus
from sepi_tpu.utils.artifacts import ArtifactCache


@pytest.fixture(scope="module")
def corpus():
    return make_synthetic_corpus(
        num_speakers=4, utts_per_speaker=3, duration_sec=1.5, seed=11
    )


@pytest.fixture(scope="module")
def lazy(corpus):
    store = AudioStore()
    store.register_pool("synth", corpus.audio)
    return store.lazy_dataset(corpus.dataset)


# ---------------------------------------------------------------------------
# FeatStore streaming writer
# ---------------------------------------------------------------------------


def test_write_stream_matches_dict_write(tmp_path, rng):
    feats = {
        f"u{i}": rng.normal(size=(int(rng.integers(4, 40)), 23)).astype(np.float32)
        for i in range(29)
    }
    s1 = FeatStore.write(str(tmp_path / "a"), feats)
    s2 = FeatStore.write_stream(str(tmp_path / "b"), iter(feats.items()))
    assert set(s1) == set(s2) == set(feats)
    for u in feats:
        np.testing.assert_array_equal(np.asarray(s1[u]), feats[u])
        np.testing.assert_array_equal(np.asarray(s2[u]), feats[u])
    # reopen reads the patched npy header correctly
    r = FeatStore.open(str(tmp_path / "b"))
    np.testing.assert_array_equal(np.asarray(r["u7"]), feats["u7"])


def test_write_stream_empty_and_errors(tmp_path, rng):
    empty = FeatStore.write_stream(str(tmp_path / "e"), iter([]))
    assert len(empty) == 0

    def bad():
        yield "u0", rng.normal(size=(5, 23)).astype(np.float32)
        yield "u1", rng.normal(size=(5, 7)).astype(np.float32)  # dim clash

    with pytest.raises(ValueError, match="dim"):
        FeatStore.write_stream(str(tmp_path / "c"), bad())
    # aborted stream leaves no partial artifacts behind
    assert not any(f.startswith("c.") for f in os.listdir(tmp_path))

    def dup():
        yield "u0", rng.normal(size=(5, 23)).astype(np.float32)
        yield "u0", rng.normal(size=(5, 23)).astype(np.float32)

    with pytest.raises(ValueError, match="duplicate"):
        FeatStore.write_stream(str(tmp_path / "d"), dup())


def test_stage_store_caches(tmp_path, rng):
    feats = {f"u{i}": rng.normal(size=(6, 23)).astype(np.float32) for i in range(5)}
    cache = ArtifactCache(str(tmp_path))
    calls = []

    def gen():
        calls.append(1)
        return iter(feats.items())

    s1 = cache.stage_store("feats", ["k"], gen)
    s2 = cache.stage_store("feats", ["k"], gen)
    assert len(calls) == 1  # second call was a pure reopen
    np.testing.assert_array_equal(np.asarray(s1["u3"]), feats["u3"])
    np.testing.assert_array_equal(np.asarray(s2["u3"]), feats["u3"])
    s3 = cache.stage_store("feats", ["other"], gen)  # different key recomputes
    assert len(calls) == 2 and set(s3) == set(feats)


# ---------------------------------------------------------------------------
# LazyAudio
# ---------------------------------------------------------------------------


def test_lazy_audio_matches_pool(corpus, lazy):
    assert set(lazy) == set(corpus.audio)
    for u in list(corpus.audio)[:4]:
        np.testing.assert_array_equal(lazy[u], corpus.audio[u])
        assert lazy.num_samples(u) == len(corpus.audio[u])


def test_lazy_audio_file_backed_fingerprint(tmp_path, rng):
    """File-backed manifest digests: stable across calls, no decode
    needed, and sensitive to file edits."""
    from sepi_tpu.data.manifest import Dataset, Utterance

    paths = []
    utts = []
    for i in range(3):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, rng.normal(size=4000).astype(np.float32) * 1000, 8000)
        paths.append(p)
        utts.append(Utterance(utt_id=f"u{i}", spk_id="s0", wav=p, sample_rate=8000))
    ds = Dataset(utts, "files")
    la = AudioStore().lazy_dataset(ds)
    assert la.num_samples("u1") == 4000  # header-only probe
    fp1 = la.manifest_fingerprint()
    assert fp1 == AudioStore().lazy_dataset(ds).manifest_fingerprint()
    # edit one file -> digest changes (size/mtime probe)
    write_wav(paths[1], rng.normal(size=4100).astype(np.float32) * 1000, 8000)
    assert AudioStore().lazy_dataset(ds).manifest_fingerprint() != fp1


def test_driver_fingerprint_prefers_manifest(lazy, corpus):
    from sepi_tpu.recipes.drivers import _audio_fingerprint

    fp = _audio_fingerprint(lazy)
    assert fp == lazy.manifest_fingerprint()
    # content opt-in equals the plain-dict digest of the same signals
    assert _audio_fingerprint(lazy, content_hash=True) == _audio_fingerprint(
        dict(corpus.audio)
    )


def test_streaming_features_match_eager(corpus, lazy):
    from sepi_tpu.recipes import pipeline

    eager = pipeline.prepare_features_nosil(corpus.audio)
    streamed = dict(pipeline.iter_features_nosil(lazy))
    assert set(eager) == set(streamed)
    for u in eager:
        np.testing.assert_array_equal(eager[u], streamed[u])


# ---------------------------------------------------------------------------
# Lazy augmentation
# ---------------------------------------------------------------------------


def test_lazy_augmentation_bitwise_matches_eager(corpus, lazy, rng):
    from sepi_tpu.data.augment import synthetic_rir
    from sepi_tpu.recipes.drivers import AugmentOptions, _apply_augmentation

    opts = AugmentOptions(
        rirs=[synthetic_rir(seed=3)],
        noises={
            "noise": [rng.standard_normal(4000).astype(np.float32) * 100],
            "music": [rng.standard_normal(9000).astype(np.float32) * 80],
        },
        subset=7,
        seed=5,
    )
    ds_e, audio_e = _apply_augmentation(corpus.dataset, dict(corpus.audio), opts)
    ds_l, audio_l = _apply_augmentation(corpus.dataset, lazy, opts)
    assert isinstance(audio_l, ChainAudio)
    assert set(ds_e.utt_ids) == set(ds_l.utt_ids)
    assert set(audio_e) == set(audio_l)
    for u in sorted(audio_e):
        np.testing.assert_array_equal(
            np.asarray(audio_e[u]), np.asarray(audio_l[u]), err_msg=u
        )
        assert audio_l.num_samples(u) == len(audio_e[u])
    # the union view digests without decoding clean audio
    assert len(audio_l.manifest_fingerprint()) == 40


# ---------------------------------------------------------------------------
# Flat RSS (the VERDICT "done when": feature sets >> resident memory)
# ---------------------------------------------------------------------------

_RSS_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import ctypes, gc, sys
import numpy as np
from sepi_tpu.data.audio import AudioStore
from sepi_tpu.data.manifest import Dataset, Utterance
from sepi_tpu.data.featstore import FeatStore
from sepi_tpu.recipes import pipeline

MODE = sys.argv[1]
OUT = sys.argv[2]
N_UTT = int(sys.argv[3])
N_SAMP = 8 * 8000  # 256 KiB decoded f32 per utt

def vm_rss_kib():
    # retained-memory probe: collect + return freed arenas to the OS so
    # allocator retention doesn't masquerade as corpus accumulation
    gc.collect()
    ctypes.CDLL("libc.so.6").malloc_trim(0)
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS")

def synth(key):
    r = np.random.default_rng(abs(hash(key)) % (1 << 32))
    return (r.standard_normal(N_SAMP) * 1000).astype(np.float32)

store = AudioStore()
store.register_loader("gen", synth)
ds = Dataset(
    [Utterance(utt_id=f"u{i:04d}", spk_id=f"s{i % 10}", wav=f"gen:u{i:04d}",
               num_samples=N_SAMP, sample_rate=8000) for i in range(N_UTT)],
    "rss",
)
lazy = store.lazy_dataset(ds)
# warm up: compile the frontend on a full-size batch so compile-time and
# working-set allocations don't count against either mode
warm = {u: lazy[u] for u in list(lazy)[:16]}
dict(pipeline.iter_features_nosil(warm))
del warm
base = vm_rss_kib()

if MODE == "stream":
    FeatStore.write_stream(OUT + "/store", pipeline.iter_features_nosil(lazy))
    retained = None
else:  # eager: decode-all dict + in-RAM feature dict (the old driver path)
    audio = {u: lazy[u] for u in lazy}
    retained = pipeline.prepare_features_nosil(audio)
    assert len(retained) == N_UTT

print(vm_rss_kib() - base)
"""


@pytest.mark.slow
def test_streaming_feature_prep_flat_rss(tmp_path):
    """Flat memory at growing corpus size.

    The per-batch XLA working set (padded frontend buffers) dominates
    any single RSS high-water mark, so flatness is measured as SCALING:
    quadrupling the corpus must grow the streaming path's RSS high-water
    by a small fraction of the added audio, while the eager decode-all
    path (the old driver behavior) grows by at least the added corpus
    footprint."""

    def run(mode, n_utt):
        r = subprocess.run(
            [sys.executable, "-c", _RSS_SCRIPT, mode, str(tmp_path), str(n_utt)],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return int(r.stdout.strip().splitlines()[-1])  # KiB

    small, big = 60, 240
    delta_kib = (big - small) * 8 * 8000 * 4 // 1024  # added decoded audio
    stream_small = run("stream", small)
    stream_big = run("stream", big)
    eager_big = run("eager", big)
    # eager at 240 utts holds all decoded audio + features over baseline
    assert eager_big - stream_big > delta_kib * 0.6, (eager_big, stream_big, delta_kib)
    # streaming growth across a 4x corpus: far below the added audio
    assert stream_big - stream_small < delta_kib * 0.25, (
        stream_small, stream_big, delta_kib)
    # and the streamed store round-trips
    s = FeatStore.open(str(tmp_path / "store"))
    assert len(s) == big and np.asarray(s["u0000"]).shape[1] == 23
