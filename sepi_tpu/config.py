"""Hierarchical dataclass configuration.

Replaces the reference's four config tiers (SURVEY.md §5): shell
`parse_options.sh` flags, `conf/*.conf` feature files, dotted argparse
namespaces, and the xconfig network DSL — with one typed dataclass tree.

Every config is a frozen dataclass with Kaldi-compatible defaults where a
Kaldi binary is being replaced, so a reference `conf/mfcc.conf` maps 1:1
onto constructor kwargs (e.g. `egs/sre/v2/conf/mfcc.conf` ->
``FrontendConfig(sample_rate=8000, low_freq=20, high_freq=3700,
num_ceps=23, snip_edges=False)``).
"""

from __future__ import annotations

import dataclasses


def _replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """MFCC / fbank extraction options (compute-mfcc-feats compatible).

    Field semantics follow Kaldi's FrameExtractionOptions /
    MelBanksOptions / MfccOptions so the reference's `conf/*.conf` files
    translate directly (see `/root/reference/egs/sre/v2/conf/mfcc.conf`).
    """

    sample_rate: int = 8000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    dither: float = 1.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"  # povey | hamming | hanning | rectangular
    round_to_power_of_two: bool = True
    snip_edges: bool = False
    # Mel bank
    num_mel_bins: int = 23
    low_freq: float = 20.0
    high_freq: float = 3700.0  # <=0 means offset from Nyquist
    # MFCC
    num_ceps: int = 23
    use_energy: bool = True  # replace C0 with log raw-frame energy
    energy_floor: float = 0.0
    raw_energy: bool = True  # energy before preemph/window
    cepstral_lifter: float = 22.0
    # fbank
    use_log_fbank: bool = True

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        n = self.frame_length
        if not self.round_to_power_of_two:
            return n
        p = 1
        while p < n:
            p *= 2
        return p

    @property
    def nyquist(self) -> float:
        return self.sample_rate / 2.0

    @property
    def high_freq_hz(self) -> float:
        return self.high_freq if self.high_freq > 0 else self.nyquist + self.high_freq

    replace = _replace


# Named presets matching the reference conf/ files.
MFCC_SRE_IVECTOR = FrontendConfig(num_ceps=20)  # v1/conf/mfcc.conf
MFCC_SRE_XVECTOR = FrontendConfig(num_ceps=23)  # v2,v3/conf/mfcc.conf
MFCC_SNIP_EDGES = FrontendConfig(num_ceps=23, snip_edges=True)  # v3 ASR feats
MFCC_HIRES = FrontendConfig(  # v1/conf/mfcc_hires.conf
    use_energy=False,
    num_mel_bins=40,
    num_ceps=40,
    low_freq=40.0,
    high_freq=-200.0,
)
MFCC_ASR = FrontendConfig(  # v1/conf/mfcc_asr.conf
    use_energy=False,
    low_freq=20.0,
    high_freq=0.0,
    num_ceps=13,
)


@dataclasses.dataclass(frozen=True)
class VadConfig:
    """Energy VAD (compute-vad compatible; v2/conf/vad.conf)."""

    energy_threshold: float = 5.5
    energy_mean_scale: float = 0.5
    frames_context: int = 2
    proportion_threshold: float = 0.12

    replace = _replace


@dataclasses.dataclass(frozen=True)
class CmvnConfig:
    """Sliding-window CMVN (apply-cmvn-sliding compatible)."""

    window: int = 300
    center: bool = True
    normalize_variance: bool = False

    replace = _replace


@dataclasses.dataclass(frozen=True)
class ChunkConfig:
    """Training-chunk sampling (replaces the egs allocation pipeline).

    Mirrors `sid/nnet3_cvector/cvector/allocate_egs_new.py` semantics:
    chunk lengths drawn per *batch bucket* (the per-archive-constant-length
    invariant, `get_egs_xvec.sh:9-14`), speaker-balanced sampling.
    """

    min_chunk_len: int = 200
    max_chunk_len: int = 400
    num_buckets: int = 8  # distinct static chunk lengths (XLA shape buckets)
    frames_per_chunk_avg: int = 300

    replace = _replace


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """SGD options matching the nnet3 trainer flags (SURVEY.md §2.8).

    Effective LR follows `steps/libs/nnet3/train/common.py:644-657`:
    exponential decay from ``initial_lr`` to ``final_lr`` over training.
    The reference multiplies by num_jobs because model averaging scales
    like local SGD; with synchronous DP we keep the same *global* batch
    and LR semantics via the `num_jobs_multiplier` hook.
    """

    initial_lr: float = 1e-3
    final_lr: float = 1e-4
    momentum: float = 0.5
    max_param_change: float = 2.0
    proportional_shrink: float = 10.0
    # The reference applies the (1 - shrink*lr) factor once per outer
    # ITERATION (an archive per job, ~50k minibatches at its scale;
    # `train_cvector_dnn.py:285-296`), NOT per minibatch.  A typical run
    # has ~this many iterations (num_epochs x archives / num_jobs), so
    # the factor is spread as (1-shrink*lr)^(shrink_iterations/total_steps)
    # per step — matching the reference's aggregate decay at any step
    # budget.  Per-step application (the naive reading) decays weights
    # faster than clipped updates can grow them and collapses training.
    shrink_iterations: int = 120
    # nnet3-train --l2-regularize-factor analog (engine option; the
    # shipped recipes leave it 0 and regularize via proportional shrink)
    l2_regularize: float = 0.0
    num_epochs: int = 3
    # NOTE deliberately NO dropout_schedule field: the reference passes
    # --trainer.dropout-schedule='0,0@0.20,0.1@0.50,0' everywhere
    # (run_xvector_new.sh:144) but none of the v1-v5 xconfigs contain a
    # dropout component (verified against run_xvector_new.sh:92-115), so
    # the flag is a silent no-op there.  We don't carry a knob that does
    # nothing; the schedule parser survives as train.optim.dropout_schedule
    # for anyone adding dropout layers.
    shrink_guard: float = 0.5  # train_cvector_dnn.py:292-296
    # "muon" = Newton-Schulz orthogonalized momentum (a Shampoo-family
    # preconditioner, the TPU-native NG-SGD substitute: the
    # orthogonalization is pure matmuls on the MXU).  DEFAULT, because
    # the reference always trains with NG-SGD and the plain-momentum
    # chain measurably cliffs on fresh wide softmax heads (the hardware
    # A/B in docs/BENCHMARKS.md "Optimizer": 0.67 vs 1.00 train accuracy
    # at step 800 on full-size v2 / 200 speakers at equal wall cost;
    # regression pinned by tests/test_optim_variants.py::
    # test_default_optimizer_clears_momentum_cliff).
    # "none" = momentum SGD (the reference's update minus NG-SGD — for
    # exact-reference-semantics comparisons; see train/optim.py).
    preconditioner: str = "muon"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    optimizer: OptimizerConfig = OptimizerConfig()
    chunks: ChunkConfig = ChunkConfig()
    batch_size: int = 64
    am_batch_size: int = 256  # multitask AM minibatch (minibatch='256;64')
    am_weight: float = 1.0
    xvec_weight: float = 1.0
    # Multitask stream accounting (get_egs_xvec.sh:126-143): the am:xvec
    # example ratio is data-driven — am egs = frames/frames_per_eg, xvec
    # egs = repeats_per_spk x speakers, archives locked together.  None
    # picks repeats_per_spk so the two streams' batch counts balance
    # (what the reference's hand-tuned 7500 achieves at its scale).
    repeats_per_spk: int = 0  # 0 = auto-balance
    # MXU compute dtype for the model's conv stacks ("bfloat16" for the
    # TPU fast path).  Params, batch-norm statistics, output logits and
    # the loss stay float32; convergence parity is pinned by
    # tests/test_optim_variants.py::test_bfloat16_training_converges.
    compute_dtype: str = "float32"
    seed: int = 123
    steps_per_eval: int = 100
    checkpoint_every: int = 100
    keep_checkpoint_every: int = 10  # preserve-model-interval
    # Train steps fused into one device dispatch (lax.scan superstep,
    # train/trainer.py).  Same update sequence; amortizes per-dispatch
    # host overhead.  Samplers emit constant-shape runs of this length
    # (the reference's per-archive-constant-chunk-length structure).
    # 1 = one dispatch per step.
    steps_per_dispatch: int = 1
    # Background-thread batch prefetch depth (ark,bg: analog,
    # data/featstore.PrefetchLoader); 0 disables.
    prefetch: int = 2
    # Opt-in JAX/XLA profiler traces: one trace per checkpoint segment,
    # written under <workdir>/profile/seg<start>-<end> (view with
    # TensorBoard/xprof).  The SURVEY §5 observability gap-closer: the
    # reference only had --verbose=1 GPU timing every 20th iteration;
    # here a full XLA op-level trace of any training window is one flag.
    profile: bool = False

    replace = _replace


@dataclasses.dataclass(frozen=True)
class ExtractConfig:
    """Chunked embedding extraction (nnet3-xvector-compute compatible).

    `extract_xvectors_new.sh:86-93`: min-chunk-size 25, chunk-size 10000,
    length-weighted averaging of per-chunk embeddings.
    """

    min_chunk_size: int = 25
    chunk_size: int = 10000
    embedding_node: str = "embedding_a"  # tdnn6.affine analog
    batch_size: int = 32

    replace = _replace


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    """LDA/PLDA backend options (run script stages, e.g. v2 run_sre10.sh:221-246)."""

    lda_dim: int = 150  # 200 for i-vector (v1/run_sre10.sh:142)
    plda_iters: int = 10
    length_norm: bool = True
    # PLDA adaptation (ivector-adapt-plda, v2/run_sre16.sh:96-103)
    adapt_within_covar_scale: float = 0.75
    adapt_between_covar_scale: float = 0.25
    # score the trial matrix on-device (backend.plda_score_matrix_device,
    # f32 GEMMs) instead of host float64 — same math, parity pinned in
    # tests/test_backend_device.py; default off so reference-semantics
    # runs keep bit-stable float64 scores
    device_scoring: bool = False

    replace = _replace


@dataclasses.dataclass(frozen=True)
class UbmConfig:
    """GMM-UBM training (sid/train_diag_ubm.sh + train_full_ubm.sh)."""

    num_gauss: int = 2048
    num_gselect: int = 20  # diag stage (train_diag_ubm.sh num_gselect)
    full_gselect: int = 20
    num_iters_init: int = 4
    num_iters_full: int = 4
    min_post: float = 0.025
    subsample: int = 5  # train on every 5th frame, like train_diag_ubm.sh
    min_gaussian_weight: float = 1e-4
    remove_low_count_gaussians: bool = False

    replace = _replace


@dataclasses.dataclass(frozen=True)
class IvectorConfig:
    """i-vector extractor (sid/train_ivector_extractor.sh)."""

    ivector_dim: int = 600
    num_iters: int = 5
    min_post: float = 0.025
    posterior_scale: float = 1.0

    replace = _replace


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    """s5-analog aligner stage (egs/sre/s5/run.sh:108-202 capability).

    Monophone Viterbi-EM (`steps/train_mono.sh`), likelihood-based state
    tying to ``num_leaves`` senones (tri6a's 5000-leaf tree), then
    ``refine_iters`` rounds of context-dependent re-alignment with
    per-senone GMMs (`steps/align_si.sh` semantics; fMLLR is a
    documented deviation).
    """

    num_leaves: int = 4096  # tri6a_4k
    mono_iters: int = 4
    refine_iters: int = 2
    min_count: float = 100.0  # min frames per tied leaf
    states_per_phone: int = 3
    comps_per_senone: int = 2
    seed: int = 0
    # LDA+MLLT feature-space stage (steps/train_lda_mllt.sh, the tri3b
    # rung: est-lda over spliced ±context frames + est-mllt/STC rounds
    # interleaved with tied-tree re-alignment; s5/run.sh:130-140).
    # Opt-in; the tied tree is reused across the transform (documented
    # deviation: Kaldi rebuilds the tree for tri3b).
    lda_mllt: bool = False
    lda_mllt_dim: int = 40
    splice_context: int = 3
    mllt_iters: int = 2
    # Speaker-adaptive pass (steps/align_fmllr.sh): estimate per-speaker
    # fMLLR transforms from the refined alignment and re-align on
    # transformed features.  Needs utt2spk at the run_s5 call site.
    fmllr: bool = False
    fmllr_min_beta: float = 200.0  # frames below which a spk stays identity

    replace = _replace


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. The TDNNs fit one chip (SURVEY.md §2.4) so the
    only sharded axis is data; the mesh is still N-D ready for parity with
    larger models."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1
