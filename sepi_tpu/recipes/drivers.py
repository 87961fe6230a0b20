"""Declarative experiment drivers — the run_sre10.sh / run_sre16.sh analogs.

One function per reference variant (SURVEY.md §0 table). Each driver is
a thin orchestration over the composable stages with durable artifact
caching (the --stage resume property), structured logging, and
per-condition reporting. Inputs are explicit data objects, not corpus
paths: LDC-gated corpora are supplied by the caller as (Dataset, audio,
trials [, transcripts/alignments]) — see SURVEY.md §7 hard part 6.

  run_v1  GMM/i-vector + LDA/PLDA        (egs/sre/v1/run_sre10.sh)
  run_v2  x-vector                       (egs/sre/v2/run_sre10.sh)
  run_v3  multitask c-vector             (egs/sre/v3/run_sre10.sh)
  run_v4  phonetic adaptation            (egs/sre/v4/run_sre10.sh)
  run_v5  combined c-vector              (egs/sre/v5/run_sre10.sh)

SRE16-style unsupervised domain adaptation (run_sre16.sh:96-103) is the
``adapt_dataset`` argument on any driver: embeddings of the unlabeled
in-domain set adapt the PLDA covariances before scoring.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

from ..config import (
    BackendConfig,
    ExtractConfig,
    IvectorConfig,
    TrainConfig,
    UbmConfig,
)
from ..data.manifest import Dataset, Trial
from ..metrics.det import EvalResult
from ..metrics.report import evaluate_conditions, format_report
from ..models import (
    AdaptedConfig,
    AmConfig,
    CombinedConfig,
    MultitaskConfig,
    XVectorConfig,
)
from ..utils.artifacts import ArtifactCache
from ..utils.logging import MetricsLogger
from . import phonetic, pipeline
from .ivector_recipe import (
    extract_v1_ivectors,
    prepare_features_ivector,
    train_v1_frontend,
)


@dataclasses.dataclass
class RunResult:
    conditions: Dict[str, EvalResult]
    scores: Dict[Tuple[str, str], float]
    report: str

    @property
    def pooled(self) -> EvalResult:
        return self.conditions["pooled"]


def save_embeddings(utt_embeddings: Mapping[str, np.ndarray], workdir: str,
                    name: str = "xvector") -> None:
    """Persist embeddings as a Kaldi ark+scp pair (ivector-mean /
    ivector-plda-scoring downstream tools can consume them directly)."""
    from ..utils import ArkWriter

    with ArkWriter(f"{workdir}/{name}.ark", f"{workdir}/{name}.scp") as w:
        for utt in sorted(utt_embeddings):
            w.put_matrix(utt, np.asarray(utt_embeddings[utt])[None, :])


def _finish(
    utt_embeddings: Mapping[str, np.ndarray],
    train_dataset: Dataset,
    trials: Sequence[Trial],
    enroll_spk2utt: Mapping[str, Sequence[str]],
    backend_cfg: BackendConfig,
    adapt_embeddings: Optional[np.ndarray],
    condition_fn,
    log,
    workdir: Optional[str] = None,
) -> RunResult:
    if workdir:
        save_embeddings(utt_embeddings, workdir)
    result, art = pipeline.backend_eval(
        utt_embeddings, train_dataset, trials, enroll_spk2utt, backend_cfg,
        adapt_vectors=adapt_embeddings,
    )
    conds = evaluate_conditions(art["scores"], trials, condition_fn)
    report = format_report(conds)
    if log:
        for line in report.splitlines():
            print(line, flush=True)
    return RunResult(conds, art["scores"], report)


def run_v2(
    train_dataset: Dataset,
    train_audio: Mapping[str, np.ndarray],
    eval_dataset: Dataset,
    eval_audio: Mapping[str, np.ndarray],
    trials: Sequence[Trial],
    enroll_spk2utt: Mapping[str, Sequence[str]],
    workdir: str,
    model_cfg: Optional[XVectorConfig] = None,
    train_cfg: TrainConfig = TrainConfig(),
    extract_cfg: ExtractConfig = ExtractConfig(),
    backend_cfg: BackendConfig = BackendConfig(),
    num_steps: int = 2000,
    adapt_dataset: Optional[Dataset] = None,
    adapt_audio: Optional[Mapping[str, np.ndarray]] = None,
    condition_fn=None,
    mesh=None,
) -> RunResult:
    cache = ArtifactCache(workdir)
    log = MetricsLogger(f"{workdir}/metrics.jsonl")

    feats_train = cache.stage(
        "feats_train", [train_dataset.name, sorted(train_audio)],
        lambda: pipeline.prepare_features_nosil(train_audio), log=print,
    )
    feats_eval = cache.stage(
        "feats_eval", [eval_dataset.name, sorted(eval_audio)],
        lambda: pipeline.prepare_features_nosil(eval_audio), log=print,
    )
    model, state, _ = pipeline.train_xvector_model(
        feats_train, train_dataset, model_cfg, train_cfg, num_steps, mesh=mesh, log=log
    )
    min_frames = (model_cfg or XVectorConfig()).min_frames
    embs = pipeline.extract_and_score(model, state, {**feats_train, **feats_eval},
                                      extract_cfg, min_frames)
    adapt_embs = None
    if adapt_dataset is not None and adapt_audio is not None:
        feats_adapt = pipeline.prepare_features_nosil(adapt_audio)
        a = pipeline.extract_and_score(model, state, feats_adapt, extract_cfg, min_frames)
        adapt_embs = np.stack(list(a.values()))
    return _finish(embs, train_dataset, trials, enroll_spk2utt, backend_cfg,
                   adapt_embs, condition_fn, log, workdir)


def run_v1(
    train_dataset: Dataset,
    train_audio: Mapping[str, np.ndarray],
    eval_audio: Mapping[str, np.ndarray],
    trials: Sequence[Trial],
    enroll_spk2utt: Mapping[str, Sequence[str]],
    workdir: str,
    ubm_cfg: UbmConfig = UbmConfig(),
    iv_cfg: IvectorConfig = IvectorConfig(),
    backend_cfg: Optional[BackendConfig] = None,
    adapt_audio: Optional[Mapping[str, np.ndarray]] = None,
    condition_fn=None,
) -> RunResult:
    cache = ArtifactCache(workdir)
    log = MetricsLogger(f"{workdir}/metrics.jsonl")
    backend_cfg = backend_cfg or BackendConfig(lda_dim=200)  # v1 uses 200

    feats_train = cache.stage(
        "ivec_feats_train", [train_dataset.name, sorted(train_audio)],
        lambda: prepare_features_ivector(train_audio), log=print,
    )
    feats_eval = cache.stage(
        "ivec_feats_eval", [sorted(eval_audio)],
        lambda: prepare_features_ivector(eval_audio), log=print,
    )
    ubm, ext = train_v1_frontend(feats_train, ubm_cfg, iv_cfg)
    ivecs = extract_v1_ivectors(ubm, ext, {**feats_train, **feats_eval}, iv_cfg,
                                ubm_cfg.full_gselect)
    adapt_embs = None
    if adapt_audio is not None:
        fa = prepare_features_ivector(adapt_audio)
        a = extract_v1_ivectors(ubm, ext, fa, iv_cfg, ubm_cfg.full_gselect)
        adapt_embs = np.stack(list(a.values()))
    return _finish(ivecs, train_dataset, trials, enroll_spk2utt, backend_cfg,
                   adapt_embs, condition_fn, log, workdir)


def _phonetic_common(train_audio, eval_audio, alignments, workdir, num_senones):
    cache = ArtifactCache(workdir)
    feats_train = cache.stage(
        "feats_train", [sorted(train_audio)],
        lambda: pipeline.prepare_features_nosil(train_audio), log=print,
    )
    feats_eval = cache.stage(
        "feats_eval", [sorted(eval_audio)],
        lambda: pipeline.prepare_features_nosil(eval_audio), log=print,
    )
    if alignments is None:
        alignments = cache.stage(
            "pseudo_ali", [sorted(feats_train), num_senones],
            lambda: phonetic.pseudo_senone_alignments(feats_train, num_senones),
            log=print,
        )
        alignments = {k: np.asarray(v, np.int32) for k, v in alignments.items()}
    return cache, feats_train, feats_eval, alignments


def run_v3(
    train_dataset: Dataset,
    train_audio: Mapping[str, np.ndarray],
    eval_audio: Mapping[str, np.ndarray],
    trials: Sequence[Trial],
    enroll_spk2utt: Mapping[str, Sequence[str]],
    workdir: str,
    alignments: Optional[Mapping[str, np.ndarray]] = None,
    model_cfg: Optional[MultitaskConfig] = None,
    train_cfg: TrainConfig = TrainConfig(),
    extract_cfg: ExtractConfig = ExtractConfig(),
    backend_cfg: BackendConfig = BackendConfig(),
    num_steps: int = 2000,
    condition_fn=None,
    mesh=None,
) -> RunResult:
    model_cfg = model_cfg or MultitaskConfig(num_speakers=len(train_dataset.speakers))
    cache, feats_train, feats_eval, alignments = _phonetic_common(
        train_audio, eval_audio, alignments, workdir, model_cfg.num_senones
    )
    log = MetricsLogger(f"{workdir}/metrics.jsonl")
    model, state = phonetic.train_multitask_model(
        feats_train, alignments, train_dataset, model_cfg, train_cfg, num_steps,
        mesh=mesh, log=log,
    )
    l, r = model_cfg.xvec_context
    embs = pipeline.extract_and_score(
        model, state, {**feats_train, **feats_eval}, extract_cfg, l + r + 1,
        model_kwargs={"task": "xvec"},
    )
    return _finish(embs, train_dataset, trials, enroll_spk2utt, backend_cfg,
                   None, condition_fn, log, workdir)


def run_v4(
    train_dataset: Dataset,
    train_audio: Mapping[str, np.ndarray],
    eval_audio: Mapping[str, np.ndarray],
    trials: Sequence[Trial],
    enroll_spk2utt: Mapping[str, Sequence[str]],
    workdir: str,
    alignments: Optional[Mapping[str, np.ndarray]] = None,
    am_cfg: Optional[AmConfig] = None,
    model_cfg: Optional[AdaptedConfig] = None,
    train_cfg: TrainConfig = TrainConfig(),
    extract_cfg: ExtractConfig = ExtractConfig(),
    backend_cfg: BackendConfig = BackendConfig(),
    am_steps: int = 1000,
    num_steps: int = 2000,
    am_lr_factor: float = 0.2,
    condition_fn=None,
    mesh=None,
) -> RunResult:
    am_cfg = am_cfg or AmConfig()
    model_cfg = model_cfg or AdaptedConfig(
        num_speakers=len(train_dataset.speakers), am=am_cfg
    )
    cache, feats_train, feats_eval, alignments = _phonetic_common(
        train_audio, eval_audio, alignments, workdir, am_cfg.num_senones
    )
    log = MetricsLogger(f"{workdir}/metrics.jsonl")
    am_model, am_state = phonetic.train_am_model(
        feats_train, alignments, am_cfg, train_cfg, am_steps, mesh=mesh, log=log
    )
    model, state = phonetic.train_adapted_model(
        feats_train, train_dataset, am_model, am_state, model_cfg, train_cfg,
        num_steps, am_lr_factor, mesh=mesh, log=log,
    )
    l, r = model_cfg.context
    embs = pipeline.extract_and_score(
        model, state, {**feats_train, **feats_eval}, extract_cfg, l + r + 1
    )
    return _finish(embs, train_dataset, trials, enroll_spk2utt, backend_cfg,
                   None, condition_fn, log, workdir)


def run_v5(
    train_dataset: Dataset,
    train_audio: Mapping[str, np.ndarray],
    eval_audio: Mapping[str, np.ndarray],
    trials: Sequence[Trial],
    enroll_spk2utt: Mapping[str, Sequence[str]],
    workdir: str,
    alignments: Optional[Mapping[str, np.ndarray]] = None,
    am_cfg: Optional[AmConfig] = None,
    model_cfg: Optional[CombinedConfig] = None,
    train_cfg: TrainConfig = TrainConfig(),
    extract_cfg: ExtractConfig = ExtractConfig(),
    backend_cfg: BackendConfig = BackendConfig(),
    am_steps: int = 1000,
    num_steps: int = 2000,
    am_lr_factor: float = 0.1,
    condition_fn=None,
    mesh=None,
) -> RunResult:
    am_cfg = am_cfg or AmConfig()
    model_cfg = model_cfg or CombinedConfig(
        num_speakers=len(train_dataset.speakers),
        num_senones=am_cfg.num_senones,
        am=am_cfg,
    )
    cache, feats_train, feats_eval, alignments = _phonetic_common(
        train_audio, eval_audio, alignments, workdir, am_cfg.num_senones
    )
    log = MetricsLogger(f"{workdir}/metrics.jsonl")
    am_model, am_state = phonetic.train_am_model(
        feats_train, alignments, am_cfg, train_cfg, am_steps, mesh=mesh, log=log
    )
    model, state = phonetic.train_combined_model(
        feats_train, alignments, train_dataset, am_model, am_state, model_cfg,
        train_cfg, num_steps, am_lr_factor, mesh=mesh, log=log,
    )
    al, ar = am_cfg.context
    embs = pipeline.extract_and_score(
        model, state, {**feats_train, **feats_eval}, extract_cfg, al + ar + 1,
        model_kwargs={"task": "xvec"},
    )
    return _finish(embs, train_dataset, trials, enroll_spk2utt, backend_cfg,
                   None, condition_fn, log, workdir)
