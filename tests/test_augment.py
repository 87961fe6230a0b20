"""Augmentation tests: SNR exactness, reverb energy, dataset semantics."""

import numpy as np
import pytest

from sepi_tpu.data import make_synthetic_corpus
from sepi_tpu.data.augment import (
    AugmentSpec,
    augment_dataset,
    mix_babble,
    mix_noise,
    reverberate,
    synthetic_rir,
)


def _sig(rng, n=8000):
    return (rng.standard_normal(n) * 100).astype(np.float32)


def test_mix_noise_hits_target_snr(rng):
    x = _sig(rng)
    noise = _sig(rng) * 3
    for snr in (0.0, 10.0, 20.0):
        y = mix_noise(x, noise, snr, rng)
        added = y - x
        measured = 10 * np.log10(np.mean(x**2) / np.mean(added**2))
        assert measured == pytest.approx(snr, abs=0.1)


def test_mix_noise_tiles_short_noise(rng):
    x = _sig(rng, 8000)
    noise = _sig(rng, 1000)
    y = mix_noise(x, noise, 10.0, rng)
    assert y.shape == x.shape and np.all(np.isfinite(y))


def test_babble_sums_sources(rng):
    x = _sig(rng)
    srcs = [_sig(rng) for _ in range(4)]
    y = mix_babble(x, srcs, 15.0, rng)
    added = y - x
    measured = 10 * np.log10(np.mean(x**2) / np.mean(added**2))
    assert measured == pytest.approx(15.0, abs=0.1)


def test_reverberate_preserves_power_and_length(rng):
    x = _sig(rng)
    rir = synthetic_rir()
    y = reverberate(x, rir)
    assert y.shape == x.shape
    assert np.mean(y**2) == pytest.approx(np.mean(x**2), rel=0.01)
    # an impulse RIR (delta) must return the signal (scaled)
    delta = np.zeros(100, np.float32)
    delta[0] = 1.0
    np.testing.assert_allclose(reverberate(x, delta), x, rtol=1e-3, atol=1e-2)


def test_augment_dataset_semantics(rng):
    corpus = make_synthetic_corpus(num_speakers=2, utts_per_speaker=2, duration_sec=1.0)
    rirs = [synthetic_rir(seed=1)]
    noises = {"noise": [_sig(rng, 4000)], "babble": [_sig(rng, 4000), _sig(rng, 4000), _sig(rng, 4000)]}
    aug_ds, aug_audio = augment_dataset(
        corpus.dataset, corpus.audio, rirs, noises,
        specs=(AugmentSpec("reverb"), AugmentSpec("noise", (10.0,)), AugmentSpec("babble", (15.0,))),
    )
    assert len(aug_ds) == 3 * len(corpus.dataset)
    for u in aug_ds:
        assert u.uniq_id in corpus.dataset  # utt2uniq back-pointer
        assert u.spk_id == corpus.dataset[u.uniq_id].spk_id
        assert aug_audio[u.utt_id].shape == corpus.audio[u.uniq_id].shape
    combined = corpus.dataset.combine(aug_ds)
    assert len(combined) == 4 * len(corpus.dataset)


def test_augment_skips_unavailable_kinds(rng):
    corpus = make_synthetic_corpus(num_speakers=1, utts_per_speaker=1, duration_sec=1.0)
    aug_ds, aug_audio = augment_dataset(corpus.dataset, corpus.audio)  # no rirs/noises
    assert len(aug_ds) == 0 and not aug_audio
