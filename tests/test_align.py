"""Forced-aligner tests: synthetic phone HMM world with known boundaries."""

import numpy as np
import pytest

from sepi_tpu.align import Lexicon, align_corpus, train_mono_aligner
from sepi_tpu.align.mono import SIL, align_utterance, build_graph, _flat_start_alignment

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
    """Emit features + true phone labels for a word sequence."""
    phones = [SIL] + [p for w in words for p in LEX.pron[w]] + [SIL]
    feats, labels = [], []
    for p in phones:
        n = sil_frames if p == SIL else frames_per_phone + int(rng.integers(-3, 4))
        feats.append(PHONE_MEANS[p] + rng.normal(size=(n, D)) * 0.4)
        labels.extend([p] * n)
    return np.concatenate(feats).astype(np.float32), labels


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    sentences = [["bat"], ["cab"], ["tack"], ["bat", "cab"], ["tack", "bat"],
                 ["cab", "tack"], ["bat", "tack", "cab"], ["cab", "bat"]]
    features, transcripts, true_labels = {}, {}, {}
    for i, words in enumerate(sentences * 3):
        u = f"utt{i:02d}"
        f, labs = _speak(rng, words)
        features[u] = f
        transcripts[u] = words
        true_labels[u] = labs
    return features, transcripts, true_labels


def test_graph_structure():
    g = build_graph(LEX, ["bat", "cab"], states_per_phone=3)
    # sil + 3 phones + optional sil + 3 phones + sil = 9 blocks x 3 states
    assert g.num_states == 27
    assert g.pdf[0] == 0  # starts in sil state 0
    # entry of the second word's first phone can skip the optional sil:
    # find it and check it has 3 predecessors
    n_three = sum(1 for row in g.preds if all(p >= 0 for p in row))
    assert n_three >= 1


def test_flat_start_covers_all_frames():
    g = build_graph(LEX, ["bat"], 3)
    ali = _flat_start_alignment(g, 100)
    assert ali.shape == (100,)
    assert ali[0] == 0 and ali[-1] == g.pdf[-1]


def test_train_and_align_recovers_phones(world):
    features, transcripts, true_labels = world
    aligner = train_mono_aligner(features, transcripts, LEX, num_iters=4)
    alis = align_corpus(aligner, features, transcripts, LEX)
    spp = aligner.states_per_phone
    total = correct = 0
    for u, ali in alis.items():
        assert len(ali) == features[u].shape[0]
        hyp_phones = [aligner.phones[p // spp] for p in ali]
        for h, t in zip(hyp_phones, true_labels[u]):
            total += 1
            correct += h == t
    acc = correct / total
    assert acc > 0.85, f"frame-level phone accuracy {acc:.3f}"


def test_alignment_state_monotonic(world):
    features, transcripts, _ = world
    aligner = train_mono_aligner(features, transcripts, LEX, num_iters=2)
    u = next(iter(features))
    from sepi_tpu.align.mono import _GraphCache

    cache = _GraphCache(LEX, aligner.states_per_phone)
    g = cache.get(transcripts[u])
    ali = align_utterance(aligner, g, features[u])
    # pdf path must start and end in silence
    assert ali[0] // aligner.states_per_phone == 0
    assert ali[-1] // aligner.states_per_phone == 0


def test_unalignable_raises(world):
    features, transcripts, _ = world
    aligner = train_mono_aligner(features, transcripts, LEX, num_iters=1)
    g = build_graph(LEX, ["bat", "cab", "tack"], 3)
    with pytest.raises(ValueError):
        align_utterance(aligner, g, features[next(iter(features))][:10])


def test_oov_raises():
    with pytest.raises(KeyError):
        build_graph(LEX, ["zzz"], 3)


def test_alignments_feed_phonetic_stack(world):
    """The aligner's output satisfies the alignment-artifact contract and
    trains an AM net (closing the s5 -> v3/v4/v5 loop)."""
    features, transcripts, _ = world
    aligner = train_mono_aligner(features, transcripts, LEX, num_iters=3)
    alis = align_corpus(aligner, features, transcripts, LEX)

    from sepi_tpu.config import OptimizerConfig, TrainConfig
    from sepi_tpu.models import AmConfig
    from sepi_tpu.models.tdnn import TdnnSpec
    from sepi_tpu.recipes.phonetic import train_am_model
    from sepi_tpu.data.sampler import FrameSampler
    from sepi_tpu.train.trainer import make_eval_step

    am_cfg = AmConfig(
        feat_dim=D,
        num_senones=aligner.num_senones,
        specs=(TdnnSpec(16, (-2, -1, 0, 1, 2)), TdnnSpec(8, (-3, 0, 3))),
    )
    tc = TrainConfig(
        optimizer=OptimizerConfig(initial_lr=0.03, final_lr=0.01, proportional_shrink=0.5),
        am_batch_size=64,
    )
    model, state = train_am_model(features, alis, am_cfg, tc, num_steps=100)
    sampler = FrameSampler(features, alis, 8, 64, seed=4, context=am_cfg.context)
    b = sampler.sample_batch()
    acc = float(make_eval_step(model)(state, b.feats, b.labels)["accuracy"])
    assert acc > 0.5, f"senone accuracy {acc:.2f}"


def test_pallas_viterbi_matches_reference(rng):
    """The Pallas batched Viterbi kernel is bit-identical to the scan
    implementation (interpret mode on CPU; compiled path exercised on
    TPU by the alignment benchmarks)."""
    import jax.numpy as jnp

    from sepi_tpu.align.viterbi_pallas import viterbi_batch, viterbi_batch_reference

    B, T, S, skip = 3, 40, 128, 4
    emit = rng.normal(size=(B, T, S)).astype(np.float32)
    tlen = np.array([40, 25, 33], np.int32)
    trans = np.full((B, 3, S), -1e30, np.float32)
    trans[:, 0, :] = np.log(0.6)
    trans[:, 1, 1:] = np.log(0.4)
    trans[:, 2, skip:] = np.where(
        rng.random((B, S - skip)) < 0.3, np.log(0.2), -1e30
    )
    bp_p, d_p = viterbi_batch(
        jnp.asarray(emit), jnp.asarray(tlen), jnp.asarray(trans), skip, interpret=True
    )
    bp_r, d_r = viterbi_batch_reference(
        jnp.asarray(emit), jnp.asarray(tlen), jnp.asarray(trans), skip
    )
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(bp_p), np.asarray(bp_r))


def test_pallas_viterbi_variants_and_lane_padding(rng):
    """Non-128-multiple S (lane-padded with dead states inside the
    kernel wrapper), int8 backpointers, and loop unrolling all preserve
    the reference outputs exactly."""
    import jax.numpy as jnp

    from sepi_tpu.align.viterbi_pallas import viterbi_batch, viterbi_batch_reference

    B, T, S, skip = 2, 30, 139, 4  # S forces the lane-padding path
    emit = rng.normal(size=(B, T, S)).astype(np.float32)
    tlen = np.array([30, 17], np.int32)
    trans = np.full((B, 3, S), -1e30, np.float32)
    trans[:, 0, :] = np.log(0.6)
    trans[:, 1, 1:] = np.log(0.4)
    trans[:, 2, skip:] = np.log(0.2)
    args = (jnp.asarray(emit), jnp.asarray(tlen), jnp.asarray(trans), skip)
    bp_r, d_r = viterbi_batch_reference(*args)
    for kw in ({}, {"bp_bits": 8}, {"bp_bits": 32, "unroll": 2}):
        bp_p, d_p = viterbi_batch(*args, interpret=True, **kw)
        assert bp_p.shape == bp_r.shape and d_p.shape == d_r.shape
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(bp_p), np.asarray(bp_r))


def test_batched_align_matches_per_utterance(world):
    """The bucketed batched Viterbi path must reproduce per-utterance
    alignments exactly (CPU: vectorized scan backend)."""
    features, transcripts, _ = world
    aligner = train_mono_aligner(features, transcripts, LEX, num_iters=2)
    per_utt = align_corpus(aligner, features, transcripts, LEX)
    batched = align_corpus(
        aligner, features, transcripts, LEX, batched=True, batch_size=5,
        use_pallas=False,
    )
    assert set(batched) == set(per_utt)
    for u in per_utt:
        np.testing.assert_array_equal(batched[u], per_utt[u])
