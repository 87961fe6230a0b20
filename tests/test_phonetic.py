"""Mini end-to-end runs of the phonetic stack: AM pretrain, v3 multitask,
v4 adaptation, v5 combined — on the synthetic corpus with pseudo-senone
alignments (the alignment-artifact contract of SURVEY.md §7)."""

import numpy as np
import pytest

from sepi_tpu.config import ChunkConfig, ExtractConfig, OptimizerConfig, TrainConfig
from sepi_tpu.data import make_synthetic_corpus
from sepi_tpu.models import AdaptedConfig, AmConfig, CombinedConfig, MultitaskConfig
from sepi_tpu.models.tdnn import TdnnSpec
from sepi_tpu.recipes import backend_eval, extract_and_score, prepare_features_nosil
from sepi_tpu.recipes.phonetic import (
    pseudo_senone_alignments,
    train_adapted_model,
    train_am_model,
    train_combined_model,
    train_multitask_model,
)
from sepi_tpu.train.trainer import make_eval_step

NUM_SENONES = 12

TINY_AM = AmConfig(
    feat_dim=23,
    num_senones=NUM_SENONES,
    specs=(
        TdnnSpec(24, (-2, -1, 0, 1, 2)),
        TdnnSpec(24, (-1, 0, 1)),
        TdnnSpec(24, (-1, 0, 1)),
        TdnnSpec(24, (-3, 0, 3)),
        TdnnSpec(12, (-6, -3, 0)),
    ),
)

TRAIN_CFG = TrainConfig(
    optimizer=OptimizerConfig(initial_lr=0.02, final_lr=0.005, proportional_shrink=0.5),
    chunks=ChunkConfig(min_chunk_len=50, max_chunk_len=100, num_buckets=2),
    batch_size=24,
    am_batch_size=64,
)


@pytest.fixture(scope="module")
def world():
    corpus = make_synthetic_corpus(
        num_speakers=6, utts_per_speaker=5, duration_sec=3.0, seed=21
    )
    nosil = prepare_features_nosil(corpus.audio)
    ali = pseudo_senone_alignments(nosil, NUM_SENONES, seed=3)
    return corpus, nosil, ali


def _eval_eer(corpus, model, state, nosil, min_frames, task_kwargs=None):
    embs = extract_and_score(
        model, state, nosil,
        ExtractConfig(min_chunk_size=25, chunk_size=300, batch_size=16),
        min_frames=min_frames, model_kwargs=task_kwargs,
    )
    enroll = {s: us[:1] for s, us in corpus.dataset.spk2utt.items()}
    res, _ = backend_eval(embs, corpus.dataset, corpus.trials, enroll)
    return res.eer


def test_alignments_are_frame_aligned(world):
    corpus, nosil, ali = world
    assert set(ali) == set(nosil)
    for u in list(nosil)[:3]:
        assert len(ali[u]) == nosil[u].shape[0]
        assert ali[u].max() < NUM_SENONES


@pytest.mark.slow
def test_am_pretraining_learns(world):
    corpus, nosil, ali = world
    model, state = train_am_model(nosil, ali, TINY_AM, TRAIN_CFG, num_steps=120)
    from sepi_tpu.data.sampler import FrameSampler

    sampler = FrameSampler(nosil, ali, 8, 64, seed=9, context=TINY_AM.context)
    b = sampler.sample_batch()
    ev = make_eval_step(model)
    acc = float(ev(state, b.feats, b.labels)["accuracy"])
    # GMM pseudo-senones overlap heavily, capping attainable accuracy;
    # 3x chance demonstrates the frame-CE path learns.
    assert acc > 3.0 / NUM_SENONES, f"AM frame accuracy {acc} (chance = {1 / NUM_SENONES:.2f})"

@pytest.mark.slow

def test_v3_multitask_recipe(world):
    corpus, nosil, ali = world
    cfg = MultitaskConfig(
        num_speakers=6, num_senones=NUM_SENONES, embed_dim=32,
        hidden_dim=24, pool_dim=48,
    )
    model, state = train_multitask_model(nosil, ali, corpus.dataset, cfg, TRAIN_CFG, num_steps=160)
    eer = _eval_eer(corpus, model, state, nosil, 15, {"task": "xvec"})
    assert eer < 0.15, f"v3 EER {eer:.3f}"

@pytest.mark.slow

def test_v4_adaptation_recipe(world):
    corpus, nosil, ali = world
    am_model, am_state = train_am_model(nosil, ali, TINY_AM, TRAIN_CFG, num_steps=80)
    cfg = AdaptedConfig(num_speakers=6, am=TINY_AM, embed_dim=32, hidden_dim=24, pool_dim=48)
    model, state = train_adapted_model(
        nosil, corpus.dataset, am_model, am_state, cfg, TRAIN_CFG, num_steps=160
    )
    eer = _eval_eer(corpus, model, state, nosil, cfg.context[0] + cfg.context[1] + 1)
    assert eer < 0.15, f"v4 EER {eer:.3f}"

@pytest.mark.slow

def test_v5_combined_recipe(world):
    corpus, nosil, ali = world
    am_model, am_state = train_am_model(nosil, ali, TINY_AM, TRAIN_CFG, num_steps=80)
    cfg = CombinedConfig(
        num_speakers=6, num_senones=NUM_SENONES, am=TINY_AM,
        embed_dim=32, hidden_dim=24, pool_dim=48,
    )
    model, state = train_combined_model(
        nosil, ali, corpus.dataset, am_model, am_state, cfg, TRAIN_CFG, num_steps=160
    )
    eer = _eval_eer(corpus, model, state, nosil, 21, {"task": "xvec"})
    assert eer < 0.15, f"v5 EER {eer:.3f}"


@pytest.mark.slow
def test_graft_and_lr_factor_freeze(world):
    """am_lr_factor=0 must leave the grafted AM subtree bit-identical
    after training — exercising both the graft and the optimizer's
    per-subtree LR mask (set-learning-rate-factor semantics)."""
    import dataclasses

    corpus, nosil, ali = world
    # shrinkage is a whole-model scale in the reference too, so disable it
    # here: with it on, even a frozen subtree decays.
    no_shrink = dataclasses.replace(
        TRAIN_CFG,
        optimizer=dataclasses.replace(TRAIN_CFG.optimizer, proportional_shrink=0.0),
    )
    am_model, am_state = train_am_model(nosil, ali, TINY_AM, no_shrink, num_steps=10)
    cfg = AdaptedConfig(num_speakers=6, am=TINY_AM, embed_dim=32, hidden_dim=24, pool_dim=48)
    model, state = train_adapted_model(
        nosil, corpus.dataset, am_model, am_state, cfg, no_shrink,
        num_steps=25, am_lr_factor=0.0,
    )
    k_new = np.asarray(state.params["am"]["frames"]["tdnn1"]["affine"]["kernel"])
    k_pre = np.asarray(am_state.params["frames"]["tdnn1"]["affine"]["kernel"])
    np.testing.assert_array_equal(k_new, k_pre)
    # while the x-vector branch did move
    assert not np.array_equal(
        np.asarray(state.params["xvec_branch"]["tdnn1"]["affine"]["kernel"]),
        np.zeros(1),
    )

@pytest.mark.slow

def test_multitask_checkpoint_resume_and_combine(tmp_path, world):
    """combine_cvector_models parity: the multitask trainer checkpoints,
    resumes from the latest checkpoint, and the final model is the
    checkpoint-tail combination scored on the summed per-task held-out
    objectives."""
    import dataclasses
    import os

    from sepi_tpu.train.checkpoint import latest_checkpoint

    corpus, nosil, ali = world
    cfg = MultitaskConfig(
        num_speakers=6, num_senones=NUM_SENONES, embed_dim=32,
        hidden_dim=24, pool_dim=48,
    )
    tc = dataclasses.replace(TRAIN_CFG, checkpoint_every=40)
    ckpt = str(tmp_path / "ckpt")
    model, state = train_multitask_model(
        nosil, ali, corpus.dataset, cfg, tc, num_steps=120, checkpoint_dir=ckpt,
    )
    assert latest_checkpoint(ckpt) == 120
    assert len(os.listdir(ckpt)) >= 1
    eer = _eval_eer(corpus, model, state, nosil, 15, {"task": "xvec"})
    assert eer < 0.2, f"combined multitask EER {eer:.3f}"
    # resume: ask for 40 more steps; only the delta runs
    model2, state2 = train_multitask_model(
        nosil, ali, corpus.dataset, cfg, tc, num_steps=160, checkpoint_dir=ckpt,
    )
    assert latest_checkpoint(ckpt) == 160
