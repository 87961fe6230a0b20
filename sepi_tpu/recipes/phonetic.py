"""Phonetic recipe stages: AM pretraining, v3 multitask, v4 adaptation,
v5 combined c-vector.

Maps 1:1 onto the reference drivers (SURVEY.md §3.2/3.3):

  pseudo_senone_alignments = an EXPLICIT TEST HELPER (never a driver
      default): GMM-clustered frame labels for tests that need a
      learnable labeling without a phonetic corpus.  Real drivers use
      caller-supplied alignments or the built-in s5 stage
      (recipes.s5.run_s5 — the `exp/tri6a_4k_ali` producer)
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
    and synthetic conformance runs.  NOT phonetic and never a driver
    default: pass it explicitly as ``alignments=`` where a test needs
    labels without transcripts (the real providers are caller-supplied
    alignments or `recipes.s5.run_s5`)."""
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
           model_kwargs=None, log=None, valid_batches=None, eval_steps=None,
           checkpoint_dir=None, train_cfg=None, supersteps=None, mesh=None):
    """Shared trainer loop.  With ``checkpoint_dir``, periodic checkpoints
    are written, training resumes from the latest one (--train-stage
    semantics), and the final model is the best checkpoint-tail
    combination scored on the held-out objectives summed across tasks —
    `combine_cvector_models` / nnet3-combine parity for the multitask
    trainers (`frame_level_objf/common.py:970-1055`).

    When ``train_cfg`` is given, its prefetch depth (ark,bg: analog) and
    steps_per_dispatch (superstep scan) apply."""
    from .pipeline import batch_iterator, run_checkpointed

    spd = train_cfg.steps_per_dispatch if train_cfg is not None else 1
    trainer = Trainer(
        steps=steps, state=state, log_every=50, logger=log,
        valid_batches=valid_batches, eval_steps=eval_steps, eval_every=100,
        supersteps=supersteps, steps_per_dispatch=spd, mesh=mesh,
    )
    it = batch_iterator(batch_iter, train_cfg) if train_cfg is not None else iter(batch_iter)
    try:
        if checkpoint_dir and train_cfg is not None:
            combine_objf = None
            if valid_batches and eval_steps:
                # held-out objectives summed across tasks
                # (combine_cvector_models semantics)
                def combine_objf(s):
                    total = 0.0
                    for vb in valid_batches:
                        ev = eval_steps.get(vb.task)
                        if ev is not None:
                            total += float(ev(s, vb.feats, vb.labels)["objf"])
                    return total

            state = run_checkpointed(
                trainer, it, num_steps, train_cfg, checkpoint_dir,
                log=log, combine_objf=combine_objf,
            )
        else:
            state = trainer.run(it, num_steps=num_steps)
    finally:
        if hasattr(it, "close"):
            it.close()
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
    model = AmNet(am_cfg, dtype=train_cfg.compute_dtype)
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
    from .pipeline import make_task_supersteps

    supersteps = make_task_supersteps(model, tx, {"am": {}}, train_cfg, mesh)
    state = _train(model, {"am": step}, state, iter(sampler), num_steps,
                   [sampler.sample_batch().feats for _ in range(3)], log=log,
                   train_cfg=train_cfg, supersteps=supersteps, mesh=mesh)
    return model, state


def _heldout_valid(features, alignments, dataset, cfg: TrainConfig,
                   num_heldout_utts, am_context=None, frames_per_eg: int = 8):
    """utt2uniq-aware held-out diagnostics for the phonetic trainers.

    The reference's valid_diagnostic egs are HELD-OUT utterances split
    off before dumping (`get_egs_xvec.sh:104-119`), never training
    draws.  Splits the speaker dataset, removes the held-out utts from
    the training features/alignments, and builds per-task valid batches
    from the held-out side: one xvec chunk batch (global label map) and,
    when ``am_context`` is given and held-out alignments exist, one AM
    frame batch.

    Returns (train_ds, train_features, train_alignments, valid_batches);
    valid_batches is None when nothing could be held out (tiny corpus /
    per-speaker minimums) — training then uses everything, as before.
    """
    from .pipeline import auto_heldout, heldout_split

    alignments = alignments or {}
    n = auto_heldout(dataset, num_heldout_utts)
    if n <= 0:
        return dataset, dict(features), dict(alignments), None
    train_ds, valid_ds = heldout_split(dataset, n)
    valid_utts = [u for u in valid_ds.utt_ids if u in features]
    if not valid_utts:
        return dataset, dict(features), dict(alignments), None
    label_map = dataset.speaker_label_map()
    train_feats = {u: features[u] for u in train_ds.utt_ids if u in features}
    train_ali = {u: alignments[u] for u in train_ds.utt_ids if u in alignments}
    vs = ChunkSampler(
        {u: features[u] for u in valid_utts},
        dataset.subset(valid_utts),
        cfg.chunks,
        min(cfg.batch_size, max(len(valid_utts), 2)),
        cfg.seed + 1,
        label_map=label_map,
    )
    valid_batches = [vs.sample_batch(vs.buckets[0])]
    ali_utts = [u for u in valid_utts if u in alignments]
    if am_context is not None and ali_utts:
        fs = FrameSampler(
            {u: features[u] for u in ali_utts},
            {u: alignments[u] for u in ali_utts},
            chunk_len=frames_per_eg,
            batch_size=min(cfg.am_batch_size, 64),
            seed=cfg.seed + 1,
            context=am_context,
        )
        valid_batches.append(fs.sample_batch())
    return train_ds, train_feats, train_ali, valid_batches


def _multitask_iter(features, alignments, dataset, cfg: TrainConfig,
                    am_context, num_steps, frames_per_eg: int = 8,
                    label_map=None):
    am_sampler = FrameSampler(
        features, alignments, chunk_len=frames_per_eg,
        batch_size=cfg.am_batch_size, seed=cfg.seed, context=am_context,
    )
    xvec_sampler = ChunkSampler(features, dataset, cfg.chunks, cfg.batch_size,
                                cfg.seed, block_size=cfg.steps_per_dispatch,
                                label_map=label_map)
    # Data-driven stream budget (get_egs_xvec.sh:126-143 semantics): the
    # am stream holds frames/frames_per_eg examples, the xvec stream
    # repeats_per_spk x speakers; both scale to the step budget and the
    # interleaver exhausts them together (cc:294-301,476-477).
    # AM-stream budget counts only alignment-bearing frames: augmented
    # copies (no transcripts) feed the speaker stream exclusively, and
    # FrameSampler skips them, so counting them would inflate the am:xvec
    # interleave ratio
    total_frames = sum(
        f.shape[0] for u, f in features.items() if u in alignments
    )
    am_egs = max(total_frames // frames_per_eg, 1)
    am_batches_epoch = max(-(-am_egs // cfg.am_batch_size), 1)
    if cfg.repeats_per_spk > 0:
        xvec_egs = cfg.repeats_per_spk * max(xvec_sampler.num_speakers, 1)
        xvec_batches_epoch = max(-(-xvec_egs // cfg.batch_size), 1)
    else:
        # auto-balance: the reference picks repeats_per_spk so the two
        # locked archive sets are comparable; balanced batch counts are
        # that choice made explicit
        xvec_batches_epoch = am_batches_epoch
    frac_am = am_batches_epoch / (am_batches_epoch + xvec_batches_epoch)
    num_am = min(max(int(round(num_steps * frac_am)), 1), num_steps - 1)
    interleaver = MultitaskInterleaver(
        am_sampler, xvec_sampler,
        num_am_batches=num_am + 1,
        num_xvec_batches=num_steps - num_am + 1,
        am_weight=cfg.am_weight, xvec_weight=cfg.xvec_weight, seed=cfg.seed,
        block_size=cfg.steps_per_dispatch,
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
    checkpoint_dir=None,
    num_heldout_utts=None,
):
    """v3: two-head training on interleaved single-task minibatches."""
    model = MultitaskCVector(model_cfg, dtype=train_cfg.compute_dtype)
    l, r = model_cfg.am_context
    label_map = dataset.speaker_label_map()
    train_ds, features, alignments, valid_batches = _heldout_valid(
        features, alignments, dataset, train_cfg, num_heldout_utts, (l, r)
    )
    am_sampler, xvec_sampler, interleaver = _multitask_iter(
        features, alignments, train_ds, train_cfg, (l, r), num_steps,
        label_map=label_map,
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
    from .pipeline import make_task_supersteps

    supersteps = make_task_supersteps(
        model, tx, {"am": {"task": "am"}, "xvec": {"task": "xvec"}}, train_cfg, mesh
    )
    calib = [xvec_sampler.sample_batch(b).feats for b in xvec_sampler.buckets[:3]]
    # per-task HELD-OUT diagnostics (compute_cvector_train_cv_probabilities:
    # valid batches come from the held-out split, never the train samplers)
    from ..train.trainer import make_eval_step

    eval_steps = {
        "am": make_eval_step(model, task_kwargs={"task": "am"}),
        "xvec": make_eval_step(model, task_kwargs={"task": "xvec"}),
    } if valid_batches else None
    state = _train(model, steps, state, iter(interleaver), num_steps, calib,
                   model_kwargs={"task": "both"}, log=log,
                   valid_batches=valid_batches, eval_steps=eval_steps,
                   checkpoint_dir=checkpoint_dir, train_cfg=train_cfg,
                   supersteps=supersteps, mesh=mesh)
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
    checkpoint_dir=None,
    num_heldout_utts=None,
):
    """v4: graft the pretrained AM, scale its LR, train on speaker chunks.

    Like the reference's train_raw_dnn path, training carries held-out
    valid diagnostics and (with ``checkpoint_dir``) nnet3-combine-style
    checkpoint-tail combination on the held-out objective."""
    model = AdaptedXVector(model_cfg, dtype=train_cfg.compute_dtype)
    label_map = dataset.speaker_label_map()
    train_ds, features, _, valid_batches = _heldout_valid(
        features, None, dataset, train_cfg, num_heldout_utts
    )
    sampler = ChunkSampler(features, train_ds, train_cfg.chunks,
                           train_cfg.batch_size, train_cfg.seed,
                           block_size=train_cfg.steps_per_dispatch,
                           label_map=label_map)
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
    from ..train.trainer import make_eval_step
    from .pipeline import make_task_supersteps

    supersteps = make_task_supersteps(model, tx, {"xvec": {}}, train_cfg, mesh)
    eval_steps = {"xvec": make_eval_step(model)} if valid_batches else None
    calib = [sampler.sample_batch(b).feats for b in sampler.buckets[:3]]
    state = _train(model, {"xvec": step}, state, iter(sampler), num_steps, calib,
                   log=log, valid_batches=valid_batches, eval_steps=eval_steps,
                   checkpoint_dir=checkpoint_dir, train_cfg=train_cfg,
                   supersteps=supersteps, mesh=mesh)
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
    checkpoint_dir=None,
    num_heldout_utts=None,
):
    """v5: pretrained-AM graft + multitask two-head training."""
    model = CombinedCVector(model_cfg, dtype=train_cfg.compute_dtype)
    label_map = dataset.speaker_label_map()
    train_ds, features, alignments, valid_batches = _heldout_valid(
        features, alignments, dataset, train_cfg, num_heldout_utts,
        model_cfg.am_context,
    )
    # am-task frame egs use the multitask AM head's receptive field,
    # derived from the model's Stream accounting (vars_am analog)
    am_sampler, xvec_sampler, interleaver = _multitask_iter(
        features, alignments, train_ds, train_cfg, model_cfg.am_context,
        num_steps, label_map=label_map,
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
    from ..train.trainer import make_eval_step
    from .pipeline import make_task_supersteps

    supersteps = make_task_supersteps(
        model, tx, {"am": {"task": "am"}, "xvec": {"task": "xvec"}}, train_cfg, mesh
    )
    # HELD-OUT per-task diagnostics (valid batches from the held-out
    # split, never the train samplers)
    eval_steps = {
        "am": make_eval_step(model, task_kwargs={"task": "am"}),
        "xvec": make_eval_step(model, task_kwargs={"task": "xvec"}),
    } if valid_batches else None
    calib = [xvec_sampler.sample_batch(b).feats for b in xvec_sampler.buckets[:3]]
    state = _train(model, steps, state, iter(interleaver), num_steps, calib,
                   model_kwargs={"task": "both"}, log=log,
                   valid_batches=valid_batches, eval_steps=eval_steps,
                   checkpoint_dir=checkpoint_dir, train_cfg=train_cfg,
                   supersteps=supersteps, mesh=mesh)
    return model, state
