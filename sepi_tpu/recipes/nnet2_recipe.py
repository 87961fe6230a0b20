"""The DNN/i-vector (nnet2) path — run_sre10_nnet2.sh capability.

The reference trains a p-norm multisplice TDNN on 40-dim hires MFCC
(`local/dnn/run_nnet2_multisplice.sh:47-61` via
`sid/nnet2/train_multisplice_accel2.sh`), then uses its senone softmax as
frame-to-component posteriors for a full-covariance UBM and i-vector
extractor computed on *paired* 20-dim sid features
(`sid/init_full_ubm_from_dnn.sh:100-116`: `paste-feats` of the two
streams, split back per consumer).  This module provides:

  prepare_paired_features  the paste-feats stream split: sid (20+deltas)
                           and hires (40) features from one framing, both
                           stripped by the sid-energy VAD so they stay
                           frame-aligned (`vad.scp` is computed once from
                           the sid stream and applied to both)
  train_nnet2_am           the trainer the reference has and round 1
                           lacked: frame-level senone CE on hires feats
                           with the multisplice context
  nnet2_posteriors         per-utterance senone softmax with edge-
                           replication padding (nnet2's frame-wise
                           evaluation contract: T frames in, T rows out)
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    CmvnConfig,
    FrontendConfig,
    MFCC_HIRES,
    MFCC_SRE_IVECTOR,
    OptimizerConfig,
    TrainConfig,
    VadConfig,
)
from ..data.sampler import FrameSampler
from ..models.nnet2 import Nnet2Config, Nnet2Multisplice
from ..ops import FeatureExtractor, add_deltas, energy_vad, select_voiced_frames, sliding_cmvn
from ..train import Trainer, build_optimizer, create_train_state
from ..train.trainer import make_am_step

# train_multisplice_accel2.sh defaults as wired by run_nnet2_multisplice.sh:
# initial/final effective lr 0.0015 -> 0.00015, no momentum/shrinkage.
NNET2_OPTIMIZER = OptimizerConfig(
    initial_lr=0.0015, final_lr=0.00015, momentum=0.0, proportional_shrink=0.0
)


def prepare_paired_features(
    audio: Mapping[str, np.ndarray],
    sid_frontend: FrontendConfig = MFCC_SRE_IVECTOR,
    hires_frontend: FrontendConfig = MFCC_HIRES,
    vad: VadConfig = VadConfig(),
    cmvn: CmvnConfig = CmvnConfig(),
    delta_order: int = 2,
    key=None,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """(sid_feats, hires_feats): same framing, one VAD, two streams.

    The VAD decision comes from the sid stream's C0 energy (the hires
    config drops energy), exactly as the reference computes one vad.scp
    and `select-voiced-frames` both pipelines with it.  Dither (the
    Kaldi default) draws independently per stream — the reference's two
    compute-mfcc-feats passes dither independently too; the paired
    contract is framing/mask alignment, not shared noise.  Noise is a
    pure function of (utt_id, stream, config[, key]) via per-utterance
    counter-hash seeds (ops/dither.py)."""
    from ..ops.dither import utt_seeds as _utt_seeds

    if (sid_frontend.frame_shift != hires_frontend.frame_shift
            or sid_frontend.frame_length != hires_frontend.frame_length
            or sid_frontend.snip_edges != hires_frontend.snip_edges):
        raise ValueError("paired streams need identical framing")
    dithered = sid_frontend.dither != 0.0 or hires_frontend.dither != 0.0
    salt = 0
    if key is not None and dithered:
        salt = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
    fe_sid = FeatureExtractor(sid_frontend)
    fe_hires = FeatureExtractor(hires_frontend)
    sid_out: Dict[str, np.ndarray] = {}
    hires_out: Dict[str, np.ndarray] = {}
    for utt_id, samples in audio.items():
        n = np.array(len(samples))
        s_s = s_h = None
        if dithered:
            s_s = _utt_seeds([utt_id], base_seed=salt)
            s_h = _utt_seeds([utt_id], base_seed=salt ^ 0x5EED)
        f_sid, mask = fe_sid.mfcc(samples, n, utt_seeds=s_s)
        f_hires, mask_h = fe_hires.mfcc(samples, n, utt_seeds=s_h)
        voiced = energy_vad(f_sid[:, 0], mask, vad)
        sid_d = add_deltas(f_sid, mask, order=delta_order)
        sid_n = sliding_cmvn(sid_d, mask, cmvn)
        hires_n = sliding_cmvn(f_hires, mask_h, cmvn)
        sel_s, m_s = select_voiced_frames(sid_n, voiced)
        sel_h, m_h = select_voiced_frames(hires_n, voiced)
        k = int(np.sum(np.asarray(m_s)))
        if k:
            sid_out[utt_id] = np.asarray(sel_s)[:k]
            hires_out[utt_id] = np.asarray(sel_h)[:k]
    return sid_out, hires_out


def train_nnet2_am(
    features: Mapping[str, np.ndarray],
    alignments: Mapping[str, np.ndarray],
    cfg: Optional[Nnet2Config] = None,
    train_cfg: Optional[TrainConfig] = None,
    num_steps: int = 300,
    frames_per_eg: int = 8,
    mesh=None,
    log=None,
):
    """Train the p-norm multisplice senone net on hires frame egs.

    The round-1 gap closed: `sid/nnet2/train_multisplice_accel2.sh`
    capability (frame egs + the reference LR schedule) so
    `run_sre10_nnet2.sh` parity is runnable end-to-end, not just a
    forward-only model."""
    if cfg is None:
        num_senones = 1 + max(int(np.max(a)) for a in alignments.values())
        feat_dim = next(iter(features.values())).shape[1]
        cfg = Nnet2Config(feat_dim=feat_dim, num_senones=num_senones)
    train_cfg = train_cfg or TrainConfig(optimizer=NNET2_OPTIMIZER)
    model = Nnet2Multisplice(cfg)
    sampler = FrameSampler(
        features,
        alignments,
        chunk_len=frames_per_eg,
        batch_size=train_cfg.am_batch_size,
        seed=train_cfg.seed,
        context=cfg.context,
    )
    tx, _ = build_optimizer(train_cfg.optimizer, num_steps)
    probe = sampler.sample_batch()
    state = create_train_state(model, tx, jax.random.PRNGKey(train_cfg.seed), probe.feats)
    step = make_am_step(model, tx, mesh=mesh)
    from .pipeline import batch_iterator, make_task_supersteps

    trainer = Trainer(
        steps={"am": step}, state=state, log_every=50, logger=log,
        supersteps=make_task_supersteps(model, tx, {"am": {}}, train_cfg, mesh),
        steps_per_dispatch=train_cfg.steps_per_dispatch,
        mesh=mesh,
    )
    it = batch_iterator(sampler, train_cfg)
    try:
        state = trainer.run(it, num_steps=num_steps)
    finally:
        if hasattr(it, "close"):
            it.close()
    return model, state


def nnet2_posteriors(
    model,
    state,
    features: Mapping[str, np.ndarray],
    batch_frames: int = 16384,
) -> Dict[str, np.ndarray]:
    """utt -> (T, K) senone softmax, frame-aligned with the input.

    Edge frames are covered by replication padding of the input (the
    nnet2 convention: `nnet-am-compute` pads with copies of the first/
    last frame so every input frame gets a posterior row)."""
    l, r = model.cfg.context
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def forward(x):
        out = model.apply(variables, x, train=False)
        return jax.nn.softmax(out["logits"], axis=-1)

    out: Dict[str, np.ndarray] = {}
    # length-sorted groups + grid-padded lengths: a handful of compiled
    # programs and B utterances per dispatch cover the corpus; group
    # size targets ~batch_frames frames per dispatch (memory knob)
    items = sorted(features.items(), key=lambda kv: (kv[1].shape[0], kv[0]))
    typical = items[len(items) // 2][1].shape[0] + l + r if items else 1
    group_size = max(1, batch_frames // max(typical, 1))
    for i in range(0, len(items), group_size):
        group = items[i : i + group_size]
        t_pad = -(-max(f.shape[0] + l + r for _, f in group) // 64) * 64
        dim = group[0][1].shape[1]
        x = np.zeros((len(group), t_pad, dim), np.float32)
        for j, (_, f) in enumerate(group):
            padded = np.pad(f, ((l, r), (0, 0)), mode="edge")
            x[j, : padded.shape[0]] = padded
            x[j, padded.shape[0]:] = padded[-1]  # edge-replicate the tail
        post = np.asarray(forward(jnp.asarray(x)))
        for j, (utt, f) in enumerate(group):
            out[utt] = post[j, : f.shape[0]].astype(np.float32)
    return out
