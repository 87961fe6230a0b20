"""fMLLR / CMLLR speaker-adaptive transforms (steps/align_fmllr.sh
capability): transform recovery, likelihood gain, SAT alignment."""

import numpy as np
import pytest

from sepi_tpu.align import (
    Lexicon,
    accumulate_fmllr_stats,
    align_corpus,
    apply_fmllr,
    apply_fmllr_corpus,
    estimate_fmllr,
    fmllr_transforms,
    train_mono_aligner,
)
from sepi_tpu.align.fmllr import FmllrStats, fmllr_loglike_gain
from sepi_tpu.align.mono import SIL

D = 5
PHONE_MEANS = {
    SIL: np.zeros(D),
    "a": np.array([4.0, 0, 0, 0, 0]),
    "b": np.array([0, 4.0, 0, 0, 0]),
    "k": np.array([0, 0, 4.0, 0, 0]),
    "t": np.array([0, 0, 0, 4.0, 0]),
}
LEX = Lexicon.from_dict(
    {"bat": ["b", "a", "t"], "cab": ["k", "a", "b"], "tack": ["t", "a", "k"]}
)


def _speak(rng, words, frames_per_phone=12, sil_frames=8):
    phones = [SIL] + [p for w in words for p in LEX.pron[w]] + [SIL]
    feats, labels = [], []
    for p in phones:
        n = sil_frames if p == SIL else frames_per_phone + int(rng.integers(-3, 4))
        feats.append(PHONE_MEANS[p] + rng.normal(size=(n, D)) * 0.4)
        labels.extend([p] * n)
    return np.concatenate(feats).astype(np.float32), labels


def _spk_affine(rng, scale=0.25):
    a = np.eye(D) + rng.normal(size=(D, D)) * scale / np.sqrt(D)
    b = rng.normal(size=D) * 1.0
    return a, b


@pytest.fixture(scope="module")
def sat_world():
    """Clean-model world + per-speaker affine-corrupted features."""
    rng = np.random.default_rng(17)
    sentences = [["bat"], ["cab"], ["tack"], ["bat", "cab"], ["tack", "bat"],
                 ["cab", "tack"]]
    clean, transcripts, truth = {}, {}, {}
    utt2spk = {}
    corrupted = {}
    spk_affines = {}
    for s in range(4):
        spk = f"s{s}"
        spk_affines[spk] = _spk_affine(rng)
        for i, words in enumerate(sentences * 2):
            u = f"{spk}-u{i:02d}"
            f, labs = _speak(rng, words)
            clean[u] = f
            transcripts[u] = words
            truth[u] = labs
            utt2spk[u] = spk
            a, b = spk_affines[spk]
            corrupted[u] = (f @ a.T + b).astype(np.float32)
    aligner = train_mono_aligner(clean, transcripts, LEX, num_iters=4)
    return aligner, clean, corrupted, transcripts, truth, utt2spk


def _phone_acc(aligner, alis, truth):
    spp = aligner.states_per_phone
    tot = cor = 0
    for u, a in alis.items():
        for h, t in zip((aligner.phones[p // spp] for p in a), truth[u]):
            tot += 1
            cor += h == t
    return cor / tot

@pytest.mark.slow

def test_fmllr_improves_loglike_and_alignment(sat_world):
    """The SAT loop: align corrupted features with the clean model,
    estimate per-speaker transforms, re-align — per-frame loglike and
    frame phone accuracy both improve (align_fmllr.sh's logged
    'objf impr' and its purpose)."""
    aligner, clean, corrupted, transcripts, truth, utt2spk = sat_world
    ali0 = align_corpus(aligner, corrupted, transcripts, LEX, batched=True)
    acc0 = _phone_acc(aligner, ali0, truth)
    trans = fmllr_transforms(aligner, corrupted, ali0, utt2spk, min_beta=50.0)
    assert set(trans) == set(utt2spk.values())
    # every speaker has enough frames -> no identity fallbacks
    gains = []
    for u in list(corrupted)[:8]:
        g = fmllr_loglike_gain(aligner, corrupted[u], ali0[u], trans[utt2spk[u]])
        gains.append(g)
    assert np.mean(gains) > 0.5, f"mean fMLLR loglike gain {np.mean(gains):.3f}"
    adapted = apply_fmllr_corpus(corrupted, trans, utt2spk)
    ali1 = align_corpus(aligner, adapted, transcripts, LEX, batched=True)
    acc1 = _phone_acc(aligner, ali1, truth)
    assert acc1 > acc0, f"SAT accuracy {acc1:.4f} <= first-pass {acc0:.4f}"


def test_fmllr_recovers_inverse_corruption(sat_world):
    """The estimated transform approximately inverts the speaker's
    corruption: adapted features land near the clean ones."""
    aligner, clean, corrupted, transcripts, truth, utt2spk = sat_world
    ali0 = align_corpus(aligner, corrupted, transcripts, LEX, batched=True)
    trans = fmllr_transforms(aligner, corrupted, ali0, utt2spk, min_beta=50.0)
    err_before = err_after = 0.0
    for u in corrupted:
        adapted = apply_fmllr(corrupted[u], trans[utt2spk[u]])
        err_before += float(np.mean((corrupted[u] - clean[u]) ** 2))
        err_after += float(np.mean((adapted - clean[u]) ** 2))
    assert err_after < 0.5 * err_before, (err_after, err_before)


def test_fmllr_starved_speaker_stays_identity(sat_world):
    aligner, clean, corrupted, transcripts, truth, utt2spk = sat_world
    u = next(iter(corrupted))
    tiny = {u: corrupted[u][:10]}
    ali = {u: align_corpus(aligner, {u: corrupted[u]}, transcripts, LEX)[u][:10]}
    trans = fmllr_transforms(aligner, tiny, ali, {u: "solo"}, min_beta=200.0)
    w = trans["solo"]
    np.testing.assert_array_equal(w[:, :D], np.eye(D))
    np.testing.assert_array_equal(w[:, D], np.zeros(D))


def test_fmllr_stats_sum_like_map_reduce(sat_world):
    """Per-utterance stats add to the speaker stats (the per-job accs ->
    sum shape of the reference's fMLLR estimation)."""
    aligner, clean, corrupted, transcripts, truth, utt2spk = sat_world
    spk = "s0"
    utts = [u for u, s in utt2spk.items() if s == spk][:3]
    ali = align_corpus(aligner, {u: corrupted[u] for u in utts}, transcripts, LEX)
    parts = [accumulate_fmllr_stats(aligner, corrupted[u], ali[u]) for u in utts]
    total = parts[0] + parts[1] + parts[2]
    assert total.beta == sum(p.beta for p in parts)
    w_sum = estimate_fmllr(total, min_beta=10.0)
    assert np.all(np.isfinite(w_sum))


def test_run_s5_with_fmllr(sat_world):
    """run_s5(cfg.fmllr=True) runs the SAT pass end-to-end and reports
    per-speaker transforms."""
    from sepi_tpu.config import AlignConfig
    from sepi_tpu.recipes.s5 import run_s5

    aligner, clean, corrupted, transcripts, truth, utt2spk = sat_world
    cfg = AlignConfig(num_leaves=20, mono_iters=3, refine_iters=2,
                      min_count=30.0, fmllr=True, fmllr_min_beta=50.0)
    res = run_s5(corrupted, transcripts, LEX, cfg, utt2spk=utt2spk)
    assert res.fmllr is not None and set(res.fmllr) == set(utt2spk.values())
    for u, a in res.alignments.items():
        assert len(a) == corrupted[u].shape[0]
    acc = _phone_acc_from_phones(res.phone_alignments, truth, LEX)
    assert acc > 0.75, f"SAT s5 phone accuracy {acc:.3f}"


def _phone_acc_from_phones(phone_alis, truth, lex):
    tot = cor = 0
    for u, ph in phone_alis.items():
        for h, t in zip((lex.phones[int(p)] for p in ph), truth[u]):
            tot += 1
            cor += h == t
    return cor / tot


def test_run_s5_fmllr_requires_utt2spk():
    from sepi_tpu.config import AlignConfig
    from sepi_tpu.recipes.s5 import run_s5

    with pytest.raises(ValueError, match="utt2spk"):
        run_s5({"u": np.zeros((50, D), np.float32)}, {"u": ["bat"]}, LEX,
               AlignConfig(num_leaves=8, mono_iters=1, fmllr=True))
