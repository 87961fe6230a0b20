"""Composable pipeline stages — the recipe substrate for v1-v5 drivers.

Each function is one stage of the reference's run scripts, as a pure
function over manifests + arrays (the SURVEY.md §7 design translation:
"every stage a pure function dataset -> dataset with durable artifacts"):

  prepare_features_nosil  = make_mfcc + compute_vad + prepare_feats_for_egs
                            (MFCC -> energy VAD -> sliding CMVN -> strip
                            silence; `v2/run_sre10.sh:80-165`)
  train_xvector_model     = run_xvector_new.sh stages 4-6 (egs + train)
  extract_and_score       = extract_xvectors_new.sh (chunked forward +
                            speaker means)
  backend_eval            = mean/LDA/PLDA/scoring/EER
                            (`v2/run_sre10.sh:221-334`)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np

from ..backend import compute_lda, length_normalize, subtract_global_mean, train_plda
from ..backend.plda import score_trials
from ..config import (
    BackendConfig,
    CmvnConfig,
    ExtractConfig,
    FrontendConfig,
    TrainConfig,
    VadConfig,
)
from ..data.manifest import Dataset, Trial
from ..data.sampler import ChunkSampler
from ..extract import EmbeddingExtractor
from ..metrics import EvalResult, evaluate_scores
from ..metrics.det import split_scores_by_trials
from ..models import XVector, XVectorConfig
from ..ops import FeatureExtractor, energy_vad, sliding_cmvn
from ..train import (
    Trainer,
    build_optimizer,
    create_train_state,
    finalize_batch_stats,
)
from ..train.trainer import make_xvec_step


def batch_iterator(sampler, train_cfg: TrainConfig):
    """Training batch stream with background prefetch (the `ark,bg:`
    analog): sampling overlaps device compute so the chip never waits on
    the host.  Callers should close() the returned iterator (it owns a
    producer thread) when training finishes."""
    it = iter(sampler)
    if train_cfg.prefetch > 0:
        from ..data.featstore import PrefetchLoader

        it = PrefetchLoader(it, depth=train_cfg.prefetch)
    return it


def run_checkpointed(trainer, it, num_steps: int, train_cfg: TrainConfig,
                     checkpoint_dir: str, log=None, combine_objf=None):
    """--train-stage semantics shared by every checkpointed trainer:
    resume from the latest checkpoint, run in checkpoint_every segments,
    save + log per-component parameter progress (nnet3-show-progress
    analog) at each boundary, and optionally pick the best
    checkpoint-tail combination (nnet3-combine) via ``combine_objf``."""
    import jax as _jax

    from ..train import combine_checkpoints, load_checkpoint, save_checkpoint
    from ..train.checkpoint import latest_checkpoint, parameter_progress

    import os as _os

    from ..utils.logging import profile as _profile

    done = latest_checkpoint(checkpoint_dir) or 0
    if done:
        trainer.state = load_checkpoint(trainer.state, checkpoint_dir, done)
        trainer.steps_done = done  # logged steps stay global on resume
    remaining = num_steps - done
    prev_params = _jax.device_get(trainer.state.params) if log else None
    state = trainer.state
    while remaining > 0:
        run_for = min(train_cfg.checkpoint_every, remaining)
        start = num_steps - remaining
        trace_dir = _os.path.join(
            _os.path.dirname(checkpoint_dir) or ".", "profile",
            f"seg{start}-{start + run_for}",
        ) if getattr(train_cfg, "profile", False) else None
        with _profile(trace_dir, enabled=trace_dir is not None):
            state = trainer.run(it, num_steps=run_for)
        remaining -= run_for
        save_checkpoint(
            state, checkpoint_dir, num_steps - remaining,
            keep_every=train_cfg.keep_checkpoint_every * train_cfg.checkpoint_every,
        )
        if log:
            cur_params = _jax.device_get(state.params)
            log(num_steps - remaining, "progress",
                parameter_progress(prev_params, cur_params))
            prev_params = cur_params
    if combine_objf is not None:
        last_objf = combine_objf(state)
        state, best_objf = combine_checkpoints(state, checkpoint_dir, combine_objf)
        if log:
            # nnet3-combine summary: held-out objf of the last checkpoint
            # vs the chosen checkpoint-tail combination
            log(num_steps, "combine",
                {"objf_last": float(last_objf), "objf_combined": float(best_objf)})
    return state


def make_task_supersteps(model, tx, tasks, train_cfg: TrainConfig, mesh=None):
    """Per-task superstep dispatchers (train/trainer.make_superstep) when
    steps_per_dispatch > 1; None otherwise.  ``tasks`` maps task name ->
    task_kwargs for the model apply."""
    if train_cfg.steps_per_dispatch <= 1:
        return None
    from ..train.trainer import make_superstep

    return {
        t: make_superstep(model, tx, task_kwargs=kw, mesh=mesh)
        for t, kw in tasks.items()
    }


def _shape_bucket(n: int, grid: int, growth: float = 1.3) -> int:
    """Padded-length bucket for one frontend batch: linear ``grid``
    steps up to ``4*grid`` samples, geometric ~30% steps beyond.

    A linear grid alone is wrong for corpora mixing 2 s snippets with
    10-25 s reads (gauntlet corpus v2, real SRE10 core): every extra
    half-second of max length is a NEW compiled program, and on a
    tunneled backend each compile costs tens of seconds — corpus
    feature prep became compile-bound.  The geometric tail bounds the
    distinct shapes at O(log max_len) (~15 up to 30 s) while batches
    stay length-sorted, so the padding waste the coarser buckets admit
    (<30%) is rarely realized."""
    n = max(int(n), 1)
    if n <= 4 * grid:
        return -(-n // grid) * grid
    b = 4 * grid
    while b < n:
        b = -(-int(b * growth) // grid) * grid
    return b


def _frontend_batches(
    audio: Mapping[str, np.ndarray],
    fe: FeatureExtractor,
    vad: VadConfig,
    cmvn: CmvnConfig,
    key: Optional[jax.Array],
    batch_size: int,
    pad_grid: int = 4000,
    transform=None,
):
    """Run the MFCC->VAD->[transform]->CMVN chain over length-bucketed
    padded batches.  ``transform(feats, mask)`` runs between VAD and
    CMVN (e.g. add_deltas for the i-vector 20->60-dim stream).

    Corpus feature prep as B utterances per device dispatch instead of
    one (every op in the chain is batched + masked, so results are
    identical to the per-utterance path; `tests/test_e2e.py` pins it).
    Sorting by length keeps padding waste low; padding to a `pad_grid`
    sample grid bounds the number of distinct compiled shapes.

    Yields (utt_ids, feats (B,T,D), voiced (B,T), num_frames (B,)) as
    host arrays.

    Dither: when the frontend config asks for dither (the Kaldi default,
    MfccOptions dither=1.0), each utterance's noise is a pure function
    of (utt_id, config[, key]) via per-utterance counter-hash seeds
    (ops/dither.py) — features are bitwise-invariant to batch
    composition and corpus subsetting, and the content-keyed
    ArtifactCache stays coherent.  An explicit ``key`` salts the whole
    corpus (the analog of compute-mfcc-feats' srand(seed)).
    """
    from ..ops.dither import utt_seeds as _utt_seeds

    dither_on = fe.cfg.dither != 0.0
    salt = 0
    if key is not None and dither_on:  # resolve the corpus salt ONCE
        salt = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
        key = None
    # Sort by a cheap length probe, then materialize audio one BATCH at
    # a time: with a lazy mapping (data.audio.LazyAudio) only B decoded
    # signals are ever resident, so corpus feature prep runs at flat RSS
    # (the prepare_feats_for_egs.sh streaming property).  Plain dicts
    # behave identically (len() of an in-RAM array is free).
    if hasattr(audio, "num_samples"):
        ids = sorted(audio, key=lambda u: (audio.num_samples(u), u))
    else:
        ids = sorted(audio, key=lambda u: (len(audio[u]), u))
    for i in range(0, len(ids), batch_size):
        chunk = [(u, np.asarray(audio[u])) for u in ids[i : i + batch_size]]
        pad_len = _shape_bucket(max(len(x) for _, x in chunk), pad_grid)
        samples = np.zeros((len(chunk), pad_len), np.float32)
        lengths = np.zeros((len(chunk),), np.int32)
        for b, (_, x) in enumerate(chunk):
            samples[b, : len(x)] = x
            lengths[b] = len(x)
        seeds = (_utt_seeds([u for u, _ in chunk], base_seed=salt)
                 if dither_on else None)
        feats, mask = fe.mfcc(samples, lengths, utt_seeds=seeds)
        voiced = energy_vad(feats[..., 0], mask, vad)
        if transform is not None:
            feats = transform(feats, mask)
        normed = sliding_cmvn(feats, mask, cmvn)
        yield (
            [u for u, _ in chunk],
            np.asarray(normed),
            np.asarray(voiced),
            np.asarray(mask).astype(bool).sum(axis=-1),
        )


def iter_features_nosil(
    audio: Mapping[str, np.ndarray],
    frontend: FrontendConfig = FrontendConfig(),
    vad: VadConfig = VadConfig(),
    cmvn: CmvnConfig = CmvnConfig(),
    key: Optional[jax.Array] = None,
    batch_size: int = 16,
):
    """Streaming form of `prepare_features_nosil`: yields
    (utt_id, (T_voiced, D) float32) one utterance at a time, never
    holding the corpus.  Feed to `ArtifactCache.stage_store` /
    `FeatStore.write_stream` for flat-RSS corpus feature prep."""
    fe = FeatureExtractor(frontend)
    for utt_ids, normed, voiced, _ in _frontend_batches(
        audio, fe, vad, cmvn, key, batch_size
    ):
        for b, utt_id in enumerate(utt_ids):
            v = voiced[b].astype(bool)
            if v.any():
                yield utt_id, normed[b][v]


def prepare_features_nosil(
    audio: Mapping[str, np.ndarray],
    frontend: FrontendConfig = FrontendConfig(),
    vad: VadConfig = VadConfig(),
    cmvn: CmvnConfig = CmvnConfig(),
    key: Optional[jax.Array] = None,
    batch_size: int = 16,
) -> Dict[str, np.ndarray]:
    """MFCC -> VAD -> sliding CMVN -> voiced-frame compaction, batched
    over length-bucketed utterances.

    Returns utt_id -> (T_voiced, num_ceps) float32 — the `_nosil` features
    every neural recipe trains/extracts on.  (In-memory dict form; the
    drivers stream `iter_features_nosil` into an mmap FeatStore instead.)
    """
    return dict(iter_features_nosil(audio, frontend, vad, cmvn, key, batch_size))


@dataclasses.dataclass
class PhoneticFeatures:
    """The four artifacts of `sid/nnet3_cvector/cvector/prepare_feats.sh`:
    WCMVN features with silence (for alignment / AM egs), the per-frame
    voiced mask, and the silence-stripped features (for speaker egs).
    Alignments computed on ``full`` strip to ``nosil`` row-for-row via the
    same mask (the select-voiced-ali invariant)."""

    full: Dict[str, np.ndarray]  # utt -> (T, D) wcmvn feats incl. silence
    voiced: Dict[str, np.ndarray]  # utt -> (T,) bool VAD decisions
    nosil: Dict[str, np.ndarray]  # utt -> (T_voiced, D)


def prepare_features_phonetic(
    audio: Mapping[str, np.ndarray],
    frontend: FrontendConfig = FrontendConfig(),
    vad: VadConfig = VadConfig(),
    cmvn: CmvnConfig = CmvnConfig(),
    key: Optional[jax.Array] = None,
    batch_size: int = 16,
) -> PhoneticFeatures:
    """MFCC -> VAD -> sliding CMVN, keeping both the with-silence stream
    (aligner input) and the stripped stream (speaker-net input) plus the
    mask that ties them together.  ``nosil`` is bitwise-identical to
    `prepare_features_nosil` on the same audio (stable compaction of the
    same CMVN'd frames by the same VAD decisions)."""
    fe = FeatureExtractor(frontend)
    full: Dict[str, np.ndarray] = {}
    voiced_out: Dict[str, np.ndarray] = {}
    nosil: Dict[str, np.ndarray] = {}
    for utt_ids, normed, voiced, n_frames in _frontend_batches(
        audio, fe, vad, cmvn, key, batch_size
    ):
        for b, utt_id in enumerate(utt_ids):
            n = int(n_frames[b])
            f = normed[b, :n]
            v = voiced[b, :n].astype(bool)
            full[utt_id] = f
            voiced_out[utt_id] = v
            if v.any():
                nosil[utt_id] = f[v]
    return PhoneticFeatures(full, voiced_out, nosil)


def auto_heldout(dataset: Dataset, num_heldout_utts: Optional[int]) -> int:
    """Resolve the held-out budget: None = auto (the reference ALWAYS
    holds out diagnostics — get_egs_new.sh uses 1000 utts on ~100k-utt
    corpora; scale that ~1% down to min 2 for tiny conformance corpora),
    an int (including 0 = explicitly off) passes through."""
    if num_heldout_utts is not None:
        return num_heldout_utts
    return min(1000, max(2, len(dataset) // 20))


def heldout_split(
    dataset: Dataset, num_heldout_utts: int, min_per_spk: int = 2
) -> Tuple[Dataset, Dataset]:
    """Split off held-out diagnostic utterances (get_egs_xvec.sh:104-119):
    only speakers with enough utterances contribute, so no speaker
    disappears from the training side.  Augmented copies follow their
    clean source (the utt2uniq contract): a whole uniq-group moves to the
    held-out side together, never straddling the split."""
    groups: Dict[str, list] = {}
    for u in dataset:
        groups.setdefault(u.uniq_id or u.utt_id, []).append(u)
    heldout: list = []
    remaining_counts = {s: len(us) for s, us in dataset.spk2utt.items()}
    for root in sorted(groups):
        if len(heldout) >= num_heldout_utts:
            break
        members = groups[root]
        spk = members[0].spk_id
        if remaining_counts[spk] > min_per_spk + len(members) - 1:
            heldout.extend(m.utt_id for m in members)
            remaining_counts[spk] -= len(members)
    held_set = set(heldout)
    return (
        dataset.filter(lambda u: u.utt_id not in held_set, f"{dataset.name}_train"),
        dataset.filter(lambda u: u.utt_id in held_set, f"{dataset.name}_valid"),
    )


def train_xvector_model(
    features: Mapping[str, np.ndarray],
    dataset: Dataset,
    model_cfg: Optional[XVectorConfig] = None,
    train_cfg: TrainConfig = TrainConfig(),
    num_steps: int = 500,
    mesh=None,
    log=None,
    num_heldout_utts: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
):
    """Train a v2 x-vector on nosil features; returns (model, state, label_map).

    ``num_heldout_utts`` (default: auto, see ``auto_heldout``) holds out
    utterances for valid diagnostics each eval period (the
    valid_diagnostic archives of the reference; 0 disables); with
    ``checkpoint_dir``, periodic checkpoints are written and the final
    model is the best checkpoint-tail combination scored on the held-out
    objective (nnet3-combine semantics).
    """
    from ..train.trainer import make_eval_step

    feat_dim = next(iter(features.values())).shape[1]
    label_map = dataset.speaker_label_map()
    if model_cfg is None:
        model_cfg = XVectorConfig(feat_dim=feat_dim, num_speakers=len(label_map))
    model = XVector(model_cfg, dtype=train_cfg.compute_dtype)

    train_ds, valid_batches = dataset, None
    eval_steps = None
    num_heldout_utts = auto_heldout(dataset, num_heldout_utts)
    if num_heldout_utts > 0:
        train_ds, valid_ds = heldout_split(dataset, num_heldout_utts)
        valid_utts = [u for u in valid_ds.utt_ids if u in features]
        if not valid_utts:
            # nothing could be held out (tiny corpus / per-speaker
            # minimums): train on everything, no valid diagnostics
            train_ds = dataset
        else:
            # global label map at construction: the held-out subset may
            # be missing speakers, so a subset-local map would mislabel
            valid_sampler = ChunkSampler(
                {u: features[u] for u in valid_utts},
                dataset.subset(valid_utts),
                train_cfg.chunks,
                min(train_cfg.batch_size, max(len(valid_utts), 2)),
                train_cfg.seed + 1,
                label_map=label_map,
            )
            valid_batches = [
                valid_sampler.sample_batch(l) for l in valid_sampler.buckets[:2]
            ]
            eval_steps = {"xvec": make_eval_step(model)}

    sampler = ChunkSampler(
        {u: features[u] for u in train_ds.utt_ids if u in features},
        dataset.subset(train_ds.utt_ids),
        train_cfg.chunks,
        train_cfg.batch_size,
        train_cfg.seed,
        block_size=train_cfg.steps_per_dispatch,
        label_map=label_map,
    )
    tx, _ = build_optimizer(train_cfg.optimizer, num_steps)
    probe = sampler.sample_batch(sampler.buckets[0])
    state = create_train_state(model, tx, jax.random.PRNGKey(train_cfg.seed), probe.feats)
    step = make_xvec_step(model, tx, mesh=mesh)
    supersteps = make_task_supersteps(model, tx, {"xvec": {}}, train_cfg, mesh)
    trainer = Trainer(
        steps={"xvec": step}, state=state, log_every=50, logger=log,
        valid_batches=valid_batches, eval_steps=eval_steps,
        eval_every=train_cfg.steps_per_eval,
        supersteps=supersteps,
        steps_per_dispatch=train_cfg.steps_per_dispatch,
        mesh=mesh,
    )

    it = batch_iterator(sampler, train_cfg)
    try:
        if checkpoint_dir:
            combine_objf = None
            if valid_batches and eval_steps:
                ev = eval_steps["xvec"]

                def combine_objf(s):
                    return float(
                        np.mean([
                            float(ev(s, vb.feats, vb.labels)["objf"]) for vb in valid_batches
                        ])
                    )

            state = run_checkpointed(
                trainer, it, num_steps, train_cfg, checkpoint_dir,
                log=log, combine_objf=combine_objf,
            )
        else:
            state = trainer.run(it, num_steps=num_steps)
    finally:
        if hasattr(it, "close"):
            it.close()

    calib = [sampler.sample_batch(l).feats for l in sampler.buckets[:3]]
    state = finalize_batch_stats(model, state, calib)
    return model, state, label_map


def extract_and_score(
    model,
    state,
    features: Mapping[str, np.ndarray],
    extract_cfg: ExtractConfig = ExtractConfig(),
    min_frames: int = 15,
    model_kwargs: Optional[Dict] = None,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Chunked embedding extraction for all utterances (data-parallel
    over the mesh when given)."""
    extractor = EmbeddingExtractor(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        extract_cfg,
        min_frames=min_frames,
        model_kwargs=model_kwargs,
        mesh=mesh,
    )
    return extractor.extract_utterances(features)


def backend_eval(
    utt_embeddings: Mapping[str, np.ndarray],
    train_dataset: Dataset,
    trials: Sequence[Trial],
    enroll_spk2utt: Mapping[str, Sequence[str]],
    backend_cfg: BackendConfig = BackendConfig(),
    adapt_vectors: Optional[np.ndarray] = None,
) -> Tuple[EvalResult, Dict]:
    """mean -> LDA -> length-norm -> PLDA -> trial scoring -> EER/DCF.

    ``train_dataset`` supplies the PLDA/LDA training population (its utts
    must be in utt_embeddings); ``enroll_spk2utt`` defines enrollment
    models (speaker -> utts).  Mirrors `v2/run_sre10.sh:221-334`.
    """
    train_ids = [u for u in train_dataset.utt_ids if u in utt_embeddings]
    x_train = np.stack([utt_embeddings[u] for u in train_ids])
    labels = [train_dataset[u].spk_id for u in train_ids]

    centered, global_mean = subtract_global_mean(x_train)
    lda_dim = min(backend_cfg.lda_dim, x_train.shape[1] - 1, len(set(labels)) - 1)
    lda = compute_lda(centered, labels, lda_dim)

    def project(vecs: np.ndarray, mean: np.ndarray = global_mean) -> np.ndarray:
        c = np.asarray(vecs, np.float64) - mean
        p = lda(c + lda.mean)  # lda centers internally with its own mean
        return length_normalize(p) if backend_cfg.length_norm else p

    plda = train_plda(project(x_train), labels, backend_cfg.plda_iters)
    # Reference SRE16 mean handling (`v2/run_sre16.sh:96-110`): the
    # adaptation set centers by its OWN mean before LDA/length-norm for
    # ivector-adapt-plda, and eval scoring then centers enroll/test with
    # that IN-DOMAIN mean (mean.vec of sre16_major) — the mean-shift
    # correction is part of the adaptation, not just the covariance
    # interpolation.
    scoring_mean = global_mean
    if adapt_vectors is not None:
        from ..backend import adapt_plda

        adapt_mean = np.mean(np.asarray(adapt_vectors, np.float64), axis=0)
        plda = adapt_plda(
            plda,
            project(adapt_vectors, mean=adapt_mean),
            backend_cfg.adapt_within_covar_scale,
            backend_cfg.adapt_between_covar_scale,
        )
        scoring_mean = adapt_mean

    enroll_vecs: Dict[str, np.ndarray] = {}
    num_utts: Dict[str, int] = {}
    for spk, utts in enroll_spk2utt.items():
        vecs = [utt_embeddings[u] for u in utts if u in utt_embeddings]
        if vecs:
            # speaker mean in RAW embedding space, then the scoring
            # pipeline (`ivector-mean | subtract-global-mean | transform
            # | normalize-length`, run_sre16.sh:109) — projecting before
            # averaging would re-order the length-norm nonlinearity
            enroll_vecs[spk] = project(
                np.mean(vecs, axis=0)[None], mean=scoring_mean
            )[0]
            num_utts[spk] = len(vecs)
    test_vecs = {
        t.test: project(utt_embeddings[t.test][None], mean=scoring_mean)[0]
        for t in trials
        if t.test in utt_embeddings
    }
    usable = [t for t in trials if t.model in enroll_vecs and t.test in test_vecs]
    scores = score_trials(plda, enroll_vecs, test_vecs, usable, num_utts,
                          device=backend_cfg.device_scoring)
    tgt, non = split_scores_by_trials(
        scores, [(t.model, t.test, t.target) for t in usable]
    )
    return evaluate_scores(tgt, non), {
        "scores": scores, "plda": plda, "lda": lda, "mean": scoring_mean,
    }
