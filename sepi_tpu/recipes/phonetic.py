"""Phonetic recipe stages: AM pretraining, v3 multitask, v4 adaptation,
v5 combined c-vector.

Maps 1:1 onto the reference drivers (SURVEY.md §3.2/3.3):

  pseudo_senone_alignments = a stand-in alignment provider for the
      corpus-agnostic conformance suite (the real provider consumes
      GMM-HMM forced alignments — `exp/tri6a_4k_ali` — which are an
      input artifact per SURVEY.md §7 hard part 1; aligner lands with
      the s5-equivalent stage)
  train_am_model           = local/nnet3_cvector/cvector/train_am.sh
  train_multitask_model    = train_cvector.sh -> train_cvector_dnn.py
  train_adapted_model      = train_xvector_with_am.sh (graft + lr x0.2)
  train_combined_model     = train_cvector_with_am.sh (graft + multitask)

Alignments obey the select-voiced-ali invariant: label streams are
frame-aligned with the (already silence-stripped) feature streams.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import numpy as np

from ..config import TrainConfig, UbmConfig
from ..data.manifest import Dataset
from ..data.sampler import ChunkSampler, FrameSampler, MultitaskInterleaver
from ..models import (
    AdaptedConfig,
    AdaptedXVector,
    AmConfig,
    AmNet,
    CombinedConfig,
    CombinedCVector,
    MultitaskConfig,
    MultitaskCVector,
)
from ..train import (
    Trainer,
    build_optimizer,
    create_train_state,
    finalize_batch_stats,
    graft_subtree,
)
from ..train.trainer import make_am_step, make_xvec_step


def pseudo_senone_alignments(
    features: Mapping[str, np.ndarray], num_senones: int = 32, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Frame labels from a small diag GMM over all frames (argmax
    posterior) — a consistent, learnable phone-like labeling for tests
    and synthetic conformance runs."""
    from ..classical.gmm import init_diag_from_frames, accumulate_stats, _mstep_diag
    import jax.numpy as jnp

    all_frames = np.concatenate(list(features.values()))
    cfg = UbmConfig(num_gauss=num_senones, num_gselect=num_senones)
    gmm = init_diag_from_frames(all_frames[::5], num_senones, seed)
    var_floor = float(np.var(all_frames, axis=0).mean()) * 1e-4 + 1e-6
    for _ in range(4):
        stats = accumulate_stats(gmm, jnp.asarray(all_frames[::5]), num_gselect=num_senones)
        gmm = _mstep_diag(stats, cfg, var_floor)
    out = {}
    for utt, f in features.items():
        ll = gmm.log_likes(jnp.asarray(f))
        out[utt] = np.asarray(jnp.argmax(ll, axis=1), np.int32)
    return out


def _train(model, steps: Dict, state, batch_iter, num_steps, calib_feats,
           model_kwargs=None, log=None, valid_batches=None, eval_steps=None):
    trainer = Trainer(
        steps=steps, state=state, log_every=50, logger=log,
        valid_batches=valid_batches, eval_steps=eval_steps, eval_every=100,
    )
    state = trainer.run(batch_iter, num_steps=num_steps)
    state = finalize_batch_stats(model, state, calib_feats, model_kwargs=model_kwargs)
    return state


def train_am_model(
    features: Mapping[str, np.ndarray],
    alignments: Mapping[str, np.ndarray],
    am_cfg: AmConfig,
    train_cfg: TrainConfig = TrainConfig(),
    num_steps: int = 300,
    frames_per_eg: int = 8,
    mesh=None,
    log=None,
):
    """v4 stage 0: pretrain the bottleneck ASR TDNN on frame egs."""
    model = AmNet(am_cfg)
    sampler = FrameSampler(
        features,
        alignments,
        chunk_len=frames_per_eg,
        batch_size=train_cfg.am_batch_size,
        seed=train_cfg.seed,
        context=am_cfg.context,
    )
    tx, _ = build_optimizer(train_cfg.optimizer, num_steps)
    probe = sampler.sample_batch()
    state = create_train_state(model, tx, jax.random.PRNGKey(train_cfg.seed), probe.feats)
    step = make_am_step(model, tx, mesh=mesh)
    state = _train(model, {"am": step}, state, iter(sampler), num_steps,
                   [sampler.sample_batch().feats for _ in range(3)], log=log)
    return model, state


def _multitask_iter(features, alignments, dataset, cfg: TrainConfig,
                    am_context, num_steps):
    am_sampler = FrameSampler(
        features, alignments, chunk_len=8, batch_size=cfg.am_batch_size,
        seed=cfg.seed, context=am_context,
    )
    xvec_sampler = ChunkSampler(features, dataset, cfg.chunks, cfg.batch_size, cfg.seed)
    # streams exhaust together over the step budget (cc:294-301 semantics)
    interleaver = MultitaskInterleaver(
        am_sampler, xvec_sampler,
        num_am_batches=num_steps // 2 + 1,
        num_xvec_batches=num_steps - num_steps // 2 + 1,
        am_weight=cfg.am_weight, xvec_weight=cfg.xvec_weight, seed=cfg.seed,
    )
    return am_sampler, xvec_sampler, interleaver


def train_multitask_model(
    features: Mapping[str, np.ndarray],
    alignments: Mapping[str, np.ndarray],
    dataset: Dataset,
    model_cfg: MultitaskConfig,
    train_cfg: TrainConfig = TrainConfig(),
    num_steps: int = 300,
    mesh=None,
    log=None,
):
    """v3: two-head training on interleaved single-task minibatches."""
    model = MultitaskCVector(model_cfg)
    l, r = model_cfg.am_context
    am_sampler, xvec_sampler, interleaver = _multitask_iter(
        features, alignments, dataset, train_cfg, (l, r), num_steps
    )
    tx, _ = build_optimizer(train_cfg.optimizer, num_steps)
    probe = xvec_sampler.sample_batch(xvec_sampler.buckets[0])
    state = create_train_state(
        model, tx, jax.random.PRNGKey(train_cfg.seed), probe.feats,
        model_kwargs={"task": "both"},
    )
    steps = {
        "am": make_am_step(model, tx, task_kwargs={"task": "am"}, mesh=mesh),
        "xvec": make_xvec_step(model, tx, task_kwargs={"task": "xvec"}, mesh=mesh),
    }
    calib = [xvec_sampler.sample_batch(b).feats for b in xvec_sampler.buckets[:3]]
    # per-task held-out-style diagnostics (compute_cvector_train_cv_probabilities)
    from ..train.trainer import make_eval_step

    valid_batches = [am_sampler.sample_batch(), xvec_sampler.sample_batch()]
    eval_steps = {
        "am": make_eval_step(model, task_kwargs={"task": "am"}),
        "xvec": make_eval_step(model, task_kwargs={"task": "xvec"}),
    }
    state = _train(model, steps, state, iter(interleaver), num_steps, calib,
                   model_kwargs={"task": "both"}, log=log,
                   valid_batches=valid_batches, eval_steps=eval_steps)
    return model, state


def train_adapted_model(
    features: Mapping[str, np.ndarray],
    dataset: Dataset,
    am_model,
    am_state,
    model_cfg: AdaptedConfig,
    train_cfg: TrainConfig = TrainConfig(),
    num_steps: int = 300,
    am_lr_factor: float = 0.2,
    mesh=None,
    log=None,
):
    """v4: graft the pretrained AM, scale its LR, train on speaker chunks."""
    model = AdaptedXVector(model_cfg)
    sampler = ChunkSampler(features, dataset, train_cfg.chunks, train_cfg.batch_size, train_cfg.seed)
    tx, _ = build_optimizer(
        train_cfg.optimizer, num_steps, lr_factors={"am": am_lr_factor}
    )
    probe = sampler.sample_batch(sampler.buckets[0])
    state = create_train_state(model, tx, jax.random.PRNGKey(train_cfg.seed), probe.feats)
    grafted = graft_subtree(
        {"params": state.params, "batch_stats": state.batch_stats},
        {"params": am_state.params, "batch_stats": am_state.batch_stats},
        "am",
    )
    state = state.replace(params=grafted["params"], batch_stats=grafted["batch_stats"])
    step = make_xvec_step(model, tx, mesh=mesh)
    calib = [sampler.sample_batch(b).feats for b in sampler.buckets[:3]]
    state = _train(model, {"xvec": step}, state, iter(sampler), num_steps, calib, log=log)
    return model, state


def train_combined_model(
    features: Mapping[str, np.ndarray],
    alignments: Mapping[str, np.ndarray],
    dataset: Dataset,
    am_model,
    am_state,
    model_cfg: CombinedConfig,
    train_cfg: TrainConfig = TrainConfig(),
    num_steps: int = 300,
    am_lr_factor: float = 0.1,
    mesh=None,
    log=None,
):
    """v5: pretrained-AM graft + multitask two-head training."""
    model = CombinedCVector(model_cfg)
    # xvec-branch am context must cover the pretrained AM's receptive field
    am_sampler, xvec_sampler, interleaver = _multitask_iter(
        features, alignments, dataset, train_cfg, (7, 7), num_steps
    )
    tx, _ = build_optimizer(
        train_cfg.optimizer, num_steps, lr_factors={"am": am_lr_factor}
    )
    probe = xvec_sampler.sample_batch(xvec_sampler.buckets[0])
    state = create_train_state(
        model, tx, jax.random.PRNGKey(train_cfg.seed), probe.feats,
        model_kwargs={"task": "both"},
    )
    grafted = graft_subtree(
        {"params": state.params, "batch_stats": state.batch_stats},
        {"params": am_state.params, "batch_stats": am_state.batch_stats},
        "am",
    )
    state = state.replace(params=grafted["params"], batch_stats=grafted["batch_stats"])
    steps = {
        "am": make_am_step(model, tx, task_kwargs={"task": "am"}, mesh=mesh),
        "xvec": make_xvec_step(model, tx, task_kwargs={"task": "xvec"}, mesh=mesh),
    }
    calib = [xvec_sampler.sample_batch(b).feats for b in xvec_sampler.buckets[:3]]
    state = _train(model, steps, state, iter(interleaver), num_steps, calib,
                   model_kwargs={"task": "both"}, log=log)
    return model, state
