"""Optimizer/precision variants: the Muon preconditioner (NG-SGD's
TPU-native substitute) and bfloat16 training convergence."""

import numpy as np
import pytest

from sepi_tpu.config import ChunkConfig, OptimizerConfig, TrainConfig
from sepi_tpu.data import make_synthetic_corpus
from sepi_tpu.models import XVector, XVectorConfig
from sepi_tpu.models.tdnn import TdnnSpec
from sepi_tpu.recipes import prepare_features_nosil
from sepi_tpu.train import build_optimizer

pytestmark = pytest.mark.slow  # trainer/driver e2e: slow tier

TINY_SPECS = (
    TdnnSpec(24, (-2, -1, 0, 1, 2)),
    TdnnSpec(24, (-2, 0, 2)),
    TdnnSpec(24, (-3, 0, 3)),
    TdnnSpec(24, (0,)),
    TdnnSpec(48, (0,)),
)


@pytest.fixture(scope="module")
def world():
    corpus = make_synthetic_corpus(num_speakers=5, utts_per_speaker=4, seed=77)
    nosil = prepare_features_nosil(corpus.audio)
    return corpus, nosil


def _train(world, opt_cfg, dtype="float32", num_steps=250):
    import jax

    from sepi_tpu.data.sampler import ChunkSampler
    from sepi_tpu.train import create_train_state
    from sepi_tpu.train.trainer import Trainer, make_eval_step, make_xvec_step

    corpus, nosil = world
    cfg = XVectorConfig(feat_dim=23, num_speakers=5, frame_specs=TINY_SPECS,
                        embed_dim=32)
    model = XVector(cfg, dtype=dtype)
    sampler = ChunkSampler(
        nosil, corpus.dataset,
        ChunkConfig(min_chunk_len=50, max_chunk_len=80, num_buckets=2),
        batch_size=20, seed=3,
    )
    tx, _ = build_optimizer(opt_cfg, num_steps)
    probe = sampler.sample_batch(sampler.buckets[0])
    state = create_train_state(model, tx, jax.random.PRNGKey(0), probe.feats)
    step = make_xvec_step(model, tx)
    trainer = Trainer(steps={"xvec": step}, state=state, log_every=40)
    state = trainer.run(iter(sampler), num_steps=num_steps)
    b = sampler.sample_batch(sampler.buckets[0])
    acc = float(make_eval_step(model)(state, b.feats, b.labels)["accuracy"])
    return acc, trainer.history


def test_muon_preconditioner_trains(world):
    acc, history = _train(
        world,
        OptimizerConfig(initial_lr=0.02, final_lr=0.005,
                        proportional_shrink=0.0, preconditioner="muon"),
    )
    assert acc > 0.8, f"muon-trained accuracy {acc:.2f}"
    objfs = [m["objf"] for _, task, m in history if task == "xvec"]
    assert objfs[-1] > objfs[0]  # objective improved


def test_unknown_preconditioner_raises():
    with pytest.raises(ValueError, match="preconditioner"):
        build_optimizer(OptimizerConfig(preconditioner="adagrad"), 100)


def test_default_optimizer_clears_momentum_cliff():
    """Convergence-floor pin for the DEFAULT optimizer config (the
    docs/BENCHMARKS.md 'Optimizer' A/B, scaled to CI): a fresh wide
    softmax head dominates the gradient norm and the max-param-change
    clip throttles plain momentum at the reference LR (0.67 vs 1.00 at
    step 800 on full-size v2 / 200 speakers on hardware).  At this CI
    scale (128 speakers, tiny trunk, 200 steps) momentum SGD sits at
    ~0.03 accuracy while the default (muon) reaches ~0.45.  The floor
    pins that the default path can never regress to the momentum cliff;
    the ceiling on 'none' pins that the scenario still exposes it."""
    import jax

    from sepi_tpu.data.manifest import Dataset, Utterance
    from sepi_tpu.data.sampler import ChunkSampler
    from sepi_tpu.train import create_train_state
    from sepi_tpu.train.trainer import Trainer, make_eval_step, make_xvec_step

    n_spk, steps = 128, 200
    rng = np.random.default_rng(0)
    means = rng.normal(size=(n_spk, 23)).astype(np.float32) * 0.8
    feats, utts = {}, []
    for s in range(n_spk):
        spk = f"s{s:03d}"
        for u in range(2):
            uid = f"{spk}-u{u}"
            feats[uid] = (means[s] + rng.normal(size=(120, 23))).astype(np.float32)
            utts.append(Utterance(utt_id=uid, spk_id=spk, wav="",
                                  num_samples=120 * 80, sample_rate=8000,
                                  duration=1.2))
    ds = Dataset(utts, "cliff")

    def train(opt_cfg):
        cfg = XVectorConfig(feat_dim=23, num_speakers=n_spk,
                            frame_specs=TINY_SPECS, embed_dim=32)
        model = XVector(cfg)
        sampler = ChunkSampler(
            feats, ds,
            ChunkConfig(min_chunk_len=50, max_chunk_len=80, num_buckets=2),
            batch_size=64, seed=3,
        )
        tx, _ = build_optimizer(opt_cfg, steps)
        probe = sampler.sample_batch(sampler.buckets[0])
        import jax as _j

        state = create_train_state(model, tx, _j.random.PRNGKey(0), probe.feats)
        trainer = Trainer(steps={"xvec": make_xvec_step(model, tx)},
                          state=state, log_every=1000)
        state = trainer.run(iter(sampler), num_steps=steps)
        b = sampler.sample_batch(sampler.buckets[0])
        return float(make_eval_step(model)(state, b.feats, b.labels)["accuracy"])

    assert OptimizerConfig().preconditioner == "muon"  # the default itself
    acc_default = train(OptimizerConfig())  # defaults: reference LR, muon
    acc_momentum = train(OptimizerConfig(preconditioner="none"))
    assert acc_default > 0.3, f"default optimizer regressed: acc={acc_default:.3f}"
    assert acc_momentum < 0.15, (
        f"scenario no longer exposes the cliff (momentum acc="
        f"{acc_momentum:.3f}); recalibrate the floor"
    )


def test_bfloat16_training_converges(world):
    """ROADMAP item: validate bf16 training.  Params stay f32; conv
    compute runs in bf16 (the MXU fast path); convergence must match the
    f32 run within a small margin on the synthetic corpus."""
    opt = OptimizerConfig(initial_lr=0.02, final_lr=0.005, proportional_shrink=0.5)
    acc_f32, _ = _train(world, opt, dtype="float32")
    acc_bf16, _ = _train(world, opt, dtype="bfloat16")
    assert acc_bf16 > 0.8, f"bf16 accuracy {acc_bf16:.2f}"
    assert acc_bf16 >= acc_f32 - 0.1


def test_bfloat16_multitask_step_finite(world):
    """compute_dtype plumbs through the cvector models: one am + one
    xvec minibatch on a bf16 MultitaskCVector keeps f32 params and a
    finite objective."""
    import jax
    import jax.numpy as jnp

    from sepi_tpu.data.sampler import ChunkSampler, FrameSampler
    from sepi_tpu.models import MultitaskConfig
    from sepi_tpu.models.cvector import MultitaskCVector
    from sepi_tpu.recipes.phonetic import pseudo_senone_alignments
    from sepi_tpu.train import build_optimizer, create_train_state
    from sepi_tpu.train.trainer import make_am_step, make_xvec_step

    corpus, nosil = world
    ali = pseudo_senone_alignments(nosil, 6, seed=5)
    cfg = MultitaskConfig(feat_dim=23, num_speakers=5, num_senones=6,
                          num_shared=1, embed_dim=32, hidden_dim=24, pool_dim=48)
    model = MultitaskCVector(cfg, dtype="bfloat16")
    tx, _ = build_optimizer(OptimizerConfig(initial_lr=0.01), 10)
    xv = ChunkSampler(nosil, corpus.dataset,
                      ChunkConfig(min_chunk_len=50, max_chunk_len=80, num_buckets=1),
                      batch_size=8, seed=1)
    l, r = cfg.am_context
    am = FrameSampler(nosil, ali, chunk_len=8, batch_size=16, seed=1, context=(l, r))
    probe = xv.sample_batch(xv.buckets[0])
    state = create_train_state(model, tx, jax.random.PRNGKey(0), probe.feats,
                               model_kwargs={"task": "both"})
    xstep = make_xvec_step(model, tx, task_kwargs={"task": "xvec"})
    astep = make_am_step(model, tx, task_kwargs={"task": "am"})
    state, m1 = xstep(state, probe.feats, probe.labels)
    ab = am.sample_batch()
    state, m2 = astep(state, ab.feats, ab.labels)
    assert jnp.isfinite(m1["objf"]) and jnp.isfinite(m2["objf"])
    # params must remain float32 (bf16 is compute-only)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(p.dtype == jnp.float32 for p in leaves)
