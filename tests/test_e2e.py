"""Miniature end-to-end recipe on the synthetic corpus (SURVEY.md §4):
audio -> MFCC/VAD/CMVN/nosil -> chunk-sampled x-vector training ->
chunked extraction -> mean/LDA/PLDA -> EER.

This is the framework's integration test — the analog of running
`egs/sre/v2/run_sre10.sh` on a 2-hour toy corpus.
"""

import numpy as np
import pytest

from sepi_tpu.config import ChunkConfig, ExtractConfig, OptimizerConfig, TrainConfig
from sepi_tpu.data import make_synthetic_corpus
from sepi_tpu.models import XVectorConfig
from sepi_tpu.models.tdnn import TdnnSpec
from sepi_tpu.recipes import (
    backend_eval,
    extract_and_score,
    prepare_features_nosil,
    train_xvector_model,
)

TINY_SPECS = (
    TdnnSpec(32, (-2, -1, 0, 1, 2)),
    TdnnSpec(32, (-2, 0, 2)),
    TdnnSpec(32, (-3, 0, 3)),
    TdnnSpec(32, (0,)),
    TdnnSpec(96, (0,)),
)


@pytest.fixture(scope="module")
def corpus():
    return make_synthetic_corpus(
        num_speakers=8, utts_per_speaker=6, duration_sec=4.0, seed=11
    )


@pytest.fixture(scope="module")
def nosil(corpus):
    return prepare_features_nosil(corpus.audio)


def test_feature_prep_shapes(corpus, nosil):
    assert set(nosil) == set(corpus.dataset.utt_ids)
    f = next(iter(nosil.values()))
    assert f.ndim == 2 and f.shape[1] == 23
    # silence stripping removed some frames
    total = sum(v.shape[0] for v in nosil.values())
    assert 0 < total

@pytest.mark.slow

def test_mini_v2_recipe(corpus, nosil):
    # NB: proportional_shrink is calibrated for the reference's 1e-3 LR
    # (1% decay/step); at this test's accelerated LR it must scale down.
    train_cfg = TrainConfig(
        optimizer=OptimizerConfig(
            initial_lr=0.02, final_lr=0.004, proportional_shrink=0.5
        ),
        chunks=ChunkConfig(min_chunk_len=50, max_chunk_len=120, num_buckets=3),
        batch_size=32,
    )
    model_cfg = XVectorConfig(
        feat_dim=23, num_speakers=8, frame_specs=TINY_SPECS, embed_dim=48
    )
    model, state, label_map = train_xvector_model(
        nosil, corpus.dataset, model_cfg, train_cfg, num_steps=150
    )
    embs = extract_and_score(
        model,
        state,
        nosil,
        ExtractConfig(min_chunk_size=25, chunk_size=400, batch_size=16),
        min_frames=model_cfg.min_frames,
    )
    assert set(embs) == set(nosil)
    assert next(iter(embs.values())).shape == (48,)

    # enroll on first utt per speaker (the synthetic trial design)
    spk2utt = corpus.dataset.spk2utt
    enroll = {s: us[:1] for s, us in spk2utt.items()}
    result, artifacts = backend_eval(embs, corpus.dataset, corpus.trials, enroll)
    # a trained x-vector separates synthetic speakers nearly perfectly
    assert result.eer < 0.10, f"EER {result.eer:.3f} too high"
    assert result.num_target > 0 and result.num_nontarget > 0


def test_extraction_chunking_consistency(corpus, nosil):
    """Chunked vs whole-utterance extraction agree on medium utterances."""
    from sepi_tpu.models import XVector

    model_cfg = XVectorConfig(
        feat_dim=23, num_speakers=8, frame_specs=TINY_SPECS, embed_dim=48
    )
    train_cfg = TrainConfig(
        chunks=ChunkConfig(min_chunk_len=50, max_chunk_len=100, num_buckets=2),
        batch_size=16,
    )
    model, state, _ = train_xvector_model(
        nosil, corpus.dataset, model_cfg, train_cfg, num_steps=20
    )
    utt = next(iter(nosil))
    one = {utt: nosil[utt]}
    whole = extract_and_score(
        model, state, one, ExtractConfig(chunk_size=10000), model_cfg.min_frames
    )[utt]
    chunked = extract_and_score(
        model, state, one, ExtractConfig(chunk_size=120), model_cfg.min_frames
    )[utt]
    # chunked averaging is not identical to whole-utterance pooling, but
    # must be close for stationary input (cosine > 0.98)
    cos = np.dot(whole, chunked) / (np.linalg.norm(whole) * np.linalg.norm(chunked))
    assert cos > 0.98


def test_streaming_embed_matches_whole_utterance(corpus, nosil):
    """Exact streaming pooling == one-shot pooling on the same utterance."""
    from sepi_tpu.extract import streaming_embed

    model_cfg = XVectorConfig(
        feat_dim=23, num_speakers=8, frame_specs=TINY_SPECS, embed_dim=48
    )
    train_cfg = TrainConfig(
        chunks=ChunkConfig(min_chunk_len=50, max_chunk_len=100, num_buckets=2),
        batch_size=16,
    )
    model, state, _ = train_xvector_model(
        nosil, corpus.dataset, model_cfg, train_cfg, num_steps=20
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    utt = max(nosil, key=lambda u: nosil[u].shape[0])
    feats = nosil[utt]
    whole = extract_and_score(
        model, state, {utt: feats}, ExtractConfig(chunk_size=10000),
        model_cfg.min_frames,
    )[utt]
    streamed = streaming_embed(model, variables, feats, chunk=97)
    np.testing.assert_allclose(streamed, whole, rtol=2e-3, atol=2e-3)


def test_train_with_heldout_and_checkpoints(tmp_path, corpus, nosil):
    """valid diagnostics + checkpoint-tail combination wiring."""
    import os

    model_cfg = XVectorConfig(
        feat_dim=23, num_speakers=8, frame_specs=TINY_SPECS, embed_dim=48
    )
    train_cfg = TrainConfig(
        optimizer=OptimizerConfig(initial_lr=0.02, final_lr=0.005, proportional_shrink=0.5),
        chunks=ChunkConfig(min_chunk_len=50, max_chunk_len=100, num_buckets=2),
        batch_size=16,
        checkpoint_every=20,
        steps_per_eval=20,
    )
    model, state, label_map = train_xvector_model(
        nosil, corpus.dataset, model_cfg, train_cfg, num_steps=60,
        num_heldout_utts=6, checkpoint_dir=str(tmp_path),
    )
    names = os.listdir(tmp_path)
    assert any(n.startswith("ckpt_") for n in names)
    assert len(label_map) == 8  # heldout split must not drop speakers
    embs = extract_and_score(
        model, state, nosil, ExtractConfig(chunk_size=400, batch_size=16),
        model_cfg.min_frames,
    )
    assert len(embs) == len(nosil)


def test_heldout_split_keeps_uniq_groups_together():
    """Augmented copies must land on the same side as their clean source."""
    from sepi_tpu.data.manifest import Dataset, Utterance
    from sepi_tpu.recipes.pipeline import heldout_split

    utts = []
    for s in range(3):
        for i in range(4):
            base = f"s{s}u{i}"
            utts.append(Utterance(base, f"s{s}"))
            utts.append(Utterance(f"{base}-noise", f"s{s}", uniq_id=base))
    ds = Dataset(utts)
    train, valid = heldout_split(ds, num_heldout_utts=4, min_per_spk=2)
    assert len(valid) > 0
    for u in valid:
        root = u.uniq_id or u.utt_id
        # every member of the group is in valid
        for v in ds:
            if (v.uniq_id or v.utt_id) == root:
                assert v.utt_id in valid
    assert len(train) + len(valid) == len(ds)

@pytest.mark.slow

def test_augmented_training_e2e(corpus, nosil):
    """The v2 augmentation stage: clean + noise/reverb copies combined,
    trained, and extracted — run_sre10.sh stages 2-5 in miniature."""
    from sepi_tpu.data.augment import AugmentSpec, augment_dataset, synthetic_rir

    rng = np.random.default_rng(17)
    noises = {"noise": [rng.normal(size=8000).astype(np.float32) * 500]}
    aug_ds, aug_audio = augment_dataset(
        corpus.dataset, corpus.audio, [synthetic_rir()], noises,
        specs=(AugmentSpec("reverb"), AugmentSpec("noise", (10.0,))),
        seed=3,
    )
    combined = corpus.dataset.combine(aug_ds)
    all_audio = {**corpus.audio, **aug_audio}
    feats = prepare_features_nosil(all_audio)
    train_cfg = TrainConfig(
        optimizer=OptimizerConfig(initial_lr=0.02, final_lr=0.005, proportional_shrink=0.5),
        chunks=ChunkConfig(min_chunk_len=50, max_chunk_len=100, num_buckets=2),
        batch_size=24,
    )
    model_cfg = XVectorConfig(
        feat_dim=23, num_speakers=8, frame_specs=TINY_SPECS, embed_dim=48
    )
    model, state, _ = train_xvector_model(
        feats, combined, model_cfg, train_cfg, num_steps=120, num_heldout_utts=8
    )
    embs = extract_and_score(
        model, state, {u: feats[u] for u in corpus.dataset.utt_ids},
        ExtractConfig(chunk_size=400, batch_size=16), model_cfg.min_frames,
    )
    enroll = {s: us[:1] for s, us in corpus.dataset.spk2utt.items()}
    result, _ = backend_eval(embs, corpus.dataset, corpus.trials, enroll)
    assert result.eer < 0.12, f"augmented-training EER {result.eer:.3f}"


def test_edge_cases_tiny_audio():
    """Degenerate inputs flow through the frontend without crashing."""
    from sepi_tpu.data.sampler import ChunkSampler
    from sepi_tpu.data.manifest import Dataset, Utterance

    rng = np.random.default_rng(0)
    audio = {
        "tiny": rng.normal(size=100).astype(np.float32) * 100,  # 1 frame
        "silent": np.zeros(4000, np.float32),  # VAD drops everything
        "ok": rng.normal(size=8000).astype(np.float32) * 100,
    }
    feats = prepare_features_nosil(audio)
    assert "ok" in feats
    # silent utterance produces no voiced frames -> absent from output
    assert "silent" not in feats or feats["silent"].shape[0] > 0

    # sampler with nothing long enough raises a clear error
    ds = Dataset([Utterance("ok", "s1")])
    sampler = ChunkSampler({"ok": feats["ok"]}, ds, ChunkConfig(min_chunk_len=10_000, max_chunk_len=10_000, num_buckets=1), 4)
    with pytest.raises(ValueError, match="no speaker has an utterance"):
        sampler.sample_batch()

@pytest.mark.slow

def test_batched_feature_prep_matches_per_utterance(rng):
    """prepare_features_nosil/phonetic batch utterances into padded
    length buckets; results must equal the per-utterance chain exactly
    (masked ops make padding inert)."""
    import numpy as np

    from sepi_tpu.config import CmvnConfig, FrontendConfig, VadConfig
    from sepi_tpu.ops import FeatureExtractor, energy_vad, select_voiced_frames, sliding_cmvn
    from sepi_tpu.recipes import prepare_features_nosil
    from sepi_tpu.recipes.pipeline import prepare_features_phonetic

    fcfg, vcfg, ccfg = FrontendConfig(dither=0.0), VadConfig(), CmvnConfig()
    audio = {
        f"u{i}": (rng.normal(size=(8000 + 1337 * i,)) * 3000).astype(np.float32)
        for i in range(7)
    }
    batched = prepare_features_nosil(audio, fcfg, vcfg, ccfg, batch_size=3)
    ph = prepare_features_phonetic(audio, fcfg, vcfg, ccfg)

    fe = FeatureExtractor(fcfg)
    for utt_id, samples in audio.items():
        feats, mask = fe.mfcc(samples, np.array(len(samples)))
        voiced = energy_vad(feats[:, 0], mask, vcfg)
        normed = sliding_cmvn(feats, mask, ccfg)
        sel, sel_mask = select_voiced_frames(normed, voiced)
        n = int(np.sum(np.asarray(sel_mask)))
        ref = np.asarray(sel)[:n]
        np.testing.assert_array_equal(batched[utt_id], ref, err_msg=utt_id)
        np.testing.assert_array_equal(ph.nosil[utt_id], ref, err_msg=utt_id)
        nf = int(np.sum(np.asarray(mask)))
        np.testing.assert_array_equal(ph.full[utt_id], np.asarray(normed)[:nf])
        np.testing.assert_array_equal(ph.voiced[utt_id], np.asarray(voiced)[:nf])

    # the i-vector stream (20-dim + deltas via the transform hook)
    from sepi_tpu.ops import add_deltas
    from sepi_tpu.recipes.ivector_recipe import MFCC_SRE_IVECTOR, prepare_features_ivector

    # dither off for exact parity: the batched path folds the batch index
    # into the dither key, so per-utterance equality only holds noise-free
    ivcfg = MFCC_SRE_IVECTOR.replace(dither=0.0)
    iv_batched = prepare_features_ivector(audio, frontend=ivcfg, batch_size=3)
    fe_iv = FeatureExtractor(ivcfg)
    for utt_id, samples in audio.items():
        feats, mask = fe_iv.mfcc(samples, np.array(len(samples)))
        voiced = energy_vad(feats[:, 0], mask, vcfg)
        with_d = add_deltas(feats, mask, order=2)
        normed = sliding_cmvn(with_d, mask, ccfg)
        sel, sel_mask = select_voiced_frames(normed, voiced)
        n = int(np.sum(np.asarray(sel_mask)))
        np.testing.assert_array_equal(iv_batched[utt_id], np.asarray(sel)[:n],
                                      err_msg=utt_id)
