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
    res = refine_tied_aligner(tied, features, transcripts, num_iters=2)
    refined = res.alignments
    assert set(refined) == set(features)
    for u, a in refined.items():
        assert len(a) == features[u].shape[0]
        assert 0 <= a.min() and a.max() < tied.num_senones
        # phone path is frame-aligned and within the phone inventory
        p = res.phone_alignments[u]
        assert len(p) == len(a) and p.max() < len(LEX.phones)
    # the refined senone inventory still uses more than the mono base
    used = {int(s) for a in refined.values() for s in a}
    assert len(used) > base_leaves * 0.5
    # alignment shift is tracked per iteration and bounded
    assert len(res.frames_shifted) == 2
    assert all(0.0 <= s <= 1.0 for s in res.frames_shifted)


def _coarticulated_world(seed=5, num_phones=16, num_utts=160, d=6, blend=0.42):
    """A bigger world with strong *whole-state allophony*: each phone's
    entry state is colored by the left neighbor and its exit state by the
    right neighbor (realized mean = (1-blend)*mu_p + blend*mu_neighbor for
    the whole first/last third of the segment).  Monophone GMMs are
    genuinely underfit here (their state models average over all
    contexts), which is exactly the regime where the reference's tri-pass
    context-dependent re-alignment (steps/align_si.sh rounds) improves
    boundaries.  Note blend must stay below 0.5: at 0.5 the entry frames
    of p-after-q equal the exit frames of q-before-p in distribution and
    the truth labeling is information-theoretically unrecoverable."""
    from sepi_tpu.align import Lexicon

    rng = np.random.default_rng(seed)
    names = [f"p{i:02d}" for i in range(num_phones)]
    means = {SIL: np.zeros(d)}
    for i, p in enumerate(names):
        mu = np.zeros(d)
        mu[i % d] = 3.5
        mu[(i // d) % d] += 2.0
        means[p] = mu
    words = {f"w{i:02d}": [names[rng.integers(num_phones)] for _ in range(int(rng.integers(2, 4)))]
             for i in range(24)}
    lex = Lexicon.from_dict(words)
    wlist = sorted(words)
    features, transcripts, truth = {}, {}, {}
    for ui in range(num_utts):
        ws = [wlist[int(rng.integers(len(wlist)))] for _ in range(int(rng.integers(1, 3)))]
        phones = [SIL] + [p for w in ws for p in words[w]] + [SIL]
        feats, labels = [], []
        for i, p in enumerate(phones):
            n = 9 + int(rng.integers(0, 4))
            k = n // 3
            seg = np.tile(means[p], (n, 1)).astype(np.float64)
            if i > 0:
                seg[:k] = (1 - blend) * means[p] + blend * means[phones[i - 1]]
            if i < len(phones) - 1:
                seg[n - k:] = (1 - blend) * means[p] + blend * means[phones[i + 1]]
            feats.append(seg + rng.normal(size=(n, d)) * 0.35)
            labels.extend([p] * n)
        u = f"u{ui:03d}"
        features[u] = np.concatenate(feats).astype(np.float32)
        transcripts[u] = ws
        truth[u] = labels
    return features, transcripts, truth, lex


def _phone_accuracy(phone_ali, truth, phones):
    total = correct = 0
    for u, ph in phone_ali.items():
        hyp = [phones[int(p)] for p in ph]
        for h, t in zip(hyp, truth[u]):
            total += 1
            correct += h == t
    return correct / total


def test_refinement_improves_boundaries_at_scale():
    """VERDICT round-1 item 2: at a 512+-leaf budget on a coarticulated
    corpus, >=2 rounds of context-dependent re-alignment improve frame
    phone accuracy vs the monophone pass, and the alignment shift is
    quantified per round."""
    from sepi_tpu.align import align_corpus, train_tied_aligner
    from sepi_tpu.align.tied import refine_tied_aligner

    features, transcripts, truth, lex = _coarticulated_world()
    tied = train_tied_aligner(
        features, transcripts, lex, num_leaves=512, mono_iters=4, min_count=12.0,
    )
    assert tied.num_senones > len(lex.phones) * 3  # grew past mono granularity

    mono_ali = align_corpus(tied.mono, features, transcripts, lex, batched=True)
    spp = tied.mono.states_per_phone
    mono_phones = {u: a // spp for u, a in mono_ali.items()}
    acc_mono = _phone_accuracy(mono_phones, truth, lex.phones)

    res = refine_tied_aligner(tied, features, transcripts, num_iters=3)
    acc_refined = _phone_accuracy(res.phone_alignments, truth, lex.phones)

    assert len(res.frames_shifted) == 3
    assert res.frames_shifted[0] > 0  # realignment actually moved frames
    assert acc_refined > acc_mono, (
        f"refined {acc_refined:.4f} <= mono {acc_mono:.4f}"
    )
