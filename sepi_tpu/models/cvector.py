"""Phonetic models: AM net, multitask / adapted / combined c-vectors.

Reproduces the reference's v3/v4/v5 graphs exactly (shapes cited):

- AM net (`v4/local/nnet3_cvector/cvector/train_am.sh:30-38`):
  4x650 TDNN + 128-dim bottleneck tdnn5 @ Append(-6,-3,0) -> senones.
  The phonetic feed is the *batchnorm output* of the bottleneck
  (`$am_node = tdnn5.batchnorm`, `train_xvector_with_am.sh:44-57`).
- v3 multitask (`prepare_nnet3_xconfig.sh:46-70`): shared tdnn1 (1-4
  shared layers in the _2share/_3share/_4share variants), AM branch
  tdnn2_am..tdnn7_am (512) -> output_am (senones), xvec branch mirroring
  v2 -> output (speakers); embedding tap tdnn6_xvec.affine.
- v4 adaptation (`train_xvector_with_am.sh:44-57`): x-vector branch whose
  tdnn5 input is Append(tdnn4_xvec, am.bottleneck); AM grafted from
  pretraining with per-subtree LR factor (0.2) — here the graft is a
  pytree load (see train/graft.py) and the LR factor an optax mask.
- v5 combined (`train_cvector_with_am.sh:65-89`): shared tdnn1_share +
  multitask AM branch + xvec branch with the *pretrained* AM bottleneck
  feed; trained with both heads.

All branch merging uses Stream context accounting (tdnn.py) — the nnet3
"compile three times for per-task contexts" dance
(`prepare_nnet3_xconfig.sh:72-88`) reduces to `model.context(task)`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .tdnn import (
    SegmentHead,
    StatsPooling,
    Stream,
    TdnnLayer,
    TdnnSpec,
    TdnnStack,
    append_streams,
    stack_context,
)

# ----------------------------------------------------------------- AM net


@dataclasses.dataclass(frozen=True)
class AmConfig:
    feat_dim: int = 23
    num_senones: int = 4000
    specs: Tuple[TdnnSpec, ...] = (
        TdnnSpec(650, (-2, -1, 0, 1, 2)),
        TdnnSpec(650, (-1, 0, 1)),
        TdnnSpec(650, (-1, 0, 1)),
        TdnnSpec(650, (-3, 0, 3)),
        TdnnSpec(128, (-6, -3, 0)),  # bottleneck
    )

    @property
    def context(self) -> Tuple[int, int]:
        return stack_context(self.specs)  # (13, 7)

    @property
    def bottleneck_dim(self) -> int:
        return self.specs[-1].dim


AM_BOTTLENECK = AmConfig()


class AmNet(nn.Module):
    """ASR TDNN with bottleneck; per-frame senone logits."""

    cfg: AmConfig
    bn_momentum: float = 0.95
    # MXU compute dtype for the conv stack ("bfloat16" for the fast
    # path); params and the senone logits stay float32.
    dtype: str = "float32"

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False, with_logits: bool = True):
        stream = TdnnStack(
            self.cfg.specs, bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="frames"
        )(Stream(feats, 0, 0), train)
        out = {"bottleneck": stream}
        if with_logits:
            out["logits"] = nn.Dense(self.cfg.num_senones, name="output")(stream.x)
        return out


# ------------------------------------------------------ shared/branch specs


def _prefix(dim: int) -> Tuple[TdnnSpec, ...]:
    """tdnn1..4 splice pattern shared by every branch (reference dims=512)."""
    return (
        TdnnSpec(dim, (-2, -1, 0, 1, 2)),
        TdnnSpec(dim, (-2, 0, 2)),
        TdnnSpec(dim, (-3, 0, 3)),
        TdnnSpec(dim, (0,)),
    )


def _xvec_branch(num_shared: int, dim: int = 512, pool_dim: int = 1500) -> Tuple[TdnnSpec, ...]:
    return _prefix(dim)[num_shared:4] + (TdnnSpec(pool_dim, (0,)),)


def _am_branch(num_shared: int, dim: int = 512) -> Tuple[TdnnSpec, ...]:
    return _prefix(dim)[num_shared:4] + (
        TdnnSpec(dim, (0,)),
        TdnnSpec(dim, (0,)),
        TdnnSpec(dim, (0,)),
    )


# ------------------------------------------------------------ v3 multitask


@dataclasses.dataclass(frozen=True)
class MultitaskConfig:
    feat_dim: int = 23
    num_speakers: int = 0
    num_senones: int = 4000
    num_shared: int = 1  # 1..4 (_2share/_3share/_4share variants)
    embed_dim: int = 512
    hidden_dim: int = 512
    pool_dim: int = 1500

    @property
    def shared_specs(self) -> Tuple[TdnnSpec, ...]:
        return _prefix(self.hidden_dim)[: self.num_shared]

    @property
    def xvec_context(self) -> Tuple[int, int]:
        return stack_context(
            self.shared_specs
            + _xvec_branch(self.num_shared, self.hidden_dim, self.pool_dim)
        )

    @property
    def am_context(self) -> Tuple[int, int]:
        return stack_context(
            self.shared_specs + _am_branch(self.num_shared, self.hidden_dim)
        )


V3_MULTITASK = MultitaskConfig()


class MultitaskCVector(nn.Module):
    """Two-head c-vector net; per-step single-task batches like the
    reference's interleaved egs (each minibatch is one task,
    `frame_level_objf/common.py:248-294`)."""

    cfg: MultitaskConfig
    bn_momentum: float = 0.95
    dtype: str = "float32"  # MXU compute dtype; params/logits stay f32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, frame_mask=None, train: bool = False,
                 task: str = "both"):
        cfg = self.cfg
        bm = self.bn_momentum
        dt = self.dtype
        shared = TdnnStack(cfg.shared_specs, bn_momentum=bm, dtype=dt, name="shared")(
            Stream(feats, 0, 0), train
        )
        out = {}
        if task in ("am", "both"):
            am = TdnnStack(
                _am_branch(cfg.num_shared, cfg.hidden_dim), bn_momentum=bm,
                dtype=dt, name="am_branch"
            )(shared, train)
            out["am_logits"] = nn.Dense(cfg.num_senones, name="output_am")(am.x)
            out["am_context"] = (am.left, am.right)
        if task in ("xvec", "both"):
            xv = TdnnStack(
                _xvec_branch(cfg.num_shared, cfg.hidden_dim, cfg.pool_dim),
                bn_momentum=bm,
                dtype=dt,
                name="xvec_branch",
            )(shared, train)
            pooled_mask = None
            if frame_mask is not None:
                ctx = xv.left + xv.right
                pooled_mask = frame_mask[:, ctx : ctx + xv.x.shape[1]]
            pooled = StatsPooling(name="stats")(xv.x, pooled_mask)
            out.update(
                SegmentHead(
                    cfg.embed_dim, cfg.num_speakers, bn_momentum=bm, dtype=dt,
                    name="segment"
                )(pooled, train)
            )
        return out


# ----------------------------------------------------------- v4 adaptation


@dataclasses.dataclass(frozen=True)
class AdaptedConfig:
    feat_dim: int = 23
    num_speakers: int = 0
    am: AmConfig = AM_BOTTLENECK
    embed_dim: int = 512
    hidden_dim: int = 512
    pool_dim: int = 1500

    @property
    def context(self) -> Tuple[int, int]:
        xl, xr = stack_context(_prefix(self.hidden_dim)[:4])
        al, ar = self.am.context
        return max(xl, al), max(xr, ar)  # (13, 7)


V4_ADAPTED = AdaptedConfig()


class AdaptedXVector(nn.Module):
    """x-vector with phonetic-adaptation bottleneck injection.

    tdnn5's input is Append(tdnn4_xvec, am.bottleneck); the AM subtree is
    expected to be grafted from a pretrained AmNet (train/graft.py) and
    LR-scaled via the optimizer's subtree mask.
    """

    cfg: AdaptedConfig
    bn_momentum: float = 0.95
    dtype: str = "float32"  # MXU compute dtype; params/logits stay f32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, frame_mask=None, train: bool = False):
        cfg = self.cfg
        bm = self.bn_momentum
        dt = self.dtype
        am = AmNet(cfg.am, bn_momentum=bm, dtype=dt, name="am")(
            feats, train, with_logits=False)
        xv = TdnnStack(
            _prefix(cfg.hidden_dim)[:4], bn_momentum=bm, dtype=dt, name="xvec_branch"
        )(Stream(feats, 0, 0), train)
        merged = append_streams([xv, am["bottleneck"]])
        h = TdnnLayer(
            TdnnSpec(cfg.pool_dim, (0,)), bn_momentum=bm, dtype=dt, name="tdnn5"
        )(merged.x, train)
        stream = Stream(h, merged.left, merged.right)
        pooled_mask = None
        if frame_mask is not None:
            ctx = stream.left + stream.right
            pooled_mask = frame_mask[:, ctx : ctx + stream.x.shape[1]]
        pooled = StatsPooling(name="stats")(stream.x, pooled_mask)
        return SegmentHead(
            cfg.embed_dim, cfg.num_speakers, bn_momentum=bm, dtype=dt,
            name="segment"
        )(pooled, train)


# ------------------------------------------------------------- v5 combined


@dataclasses.dataclass(frozen=True)
class CombinedConfig:
    feat_dim: int = 23
    num_speakers: int = 0
    num_senones: int = 4000
    am: AmConfig = AM_BOTTLENECK  # the *pretrained* bottleneck provider
    # 1..3 shared trunk layers (train_cvector_with_am.sh and its
    # _2share/_3share variants: shared tdnn1_share[..tdnn3_share], both
    # branches fork after the last shared layer)
    num_shared: int = 1
    embed_dim: int = 512
    hidden_dim: int = 512
    pool_dim: int = 1500

    @property
    def shared_specs(self) -> Tuple[TdnnSpec, ...]:
        return _prefix(self.hidden_dim)[: self.num_shared]

    @property
    def am_context(self) -> Tuple[int, int]:
        """Context of the multitask AM head (shared trunk + am branch) —
        the frame-egs context for the am task (vars_am analog)."""
        return stack_context(
            self.shared_specs + _am_branch(self.num_shared, self.hidden_dim))

    @property
    def xvec_context(self) -> Tuple[int, int]:
        """Context of the embedding path: the xvec branch merges with the
        pretrained AM's bottleneck stream, so its receptive field is the
        elementwise max of the two (Stream accounting, vars_xvec analog —
        with default specs (13, 7), dominated by the AM feed)."""
        xl, xr = stack_context(
            self.shared_specs
            + _xvec_branch(self.num_shared, self.hidden_dim, self.pool_dim)[:-1]
        )
        al, ar = self.am.context
        return (max(xl, al), max(xr, ar))


V5_COMBINED = CombinedConfig()


class CombinedCVector(nn.Module):
    """v5: shared tdnn1 + multitask AM branch + pretrained-AM bottleneck feed.

    Three sub-networks share the graph (`train_cvector_with_am.sh:65-89`):
      shared tdnn1_share (512 @ -2..2)
      AM branch  tdnn2_am..tdnn7_am -> output_am (senones)     [multitask]
      pretrained AmNet on raw input -> bottleneck              [grafted]
      xvec branch tdnn2..4_xvec; tdnn5 @ Append(tdnn4_xvec, bottleneck)
        -> stats -> tdnn6/7 -> output (speakers)
    """

    cfg: CombinedConfig
    bn_momentum: float = 0.95
    dtype: str = "float32"  # MXU compute dtype; params/logits stay f32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, frame_mask=None, train: bool = False,
                 task: str = "both"):
        cfg = self.cfg
        bm = self.bn_momentum
        dt = self.dtype
        shared = TdnnStack(
            cfg.shared_specs, bn_momentum=bm, dtype=dt, name="shared"
        )(Stream(feats, 0, 0), train)
        out = {}
        if task in ("am", "both"):
            am_b = TdnnStack(
                _am_branch(cfg.num_shared, cfg.hidden_dim), bn_momentum=bm,
                dtype=dt, name="am_branch"
            )(shared, train)
            out["am_logits"] = nn.Dense(cfg.num_senones, name="output_am")(am_b.x)
            out["am_context"] = (am_b.left, am_b.right)
        if task in ("xvec", "both"):
            pre = AmNet(cfg.am, bn_momentum=bm, dtype=dt, name="am")(
                feats, train, with_logits=False)
            xv = TdnnStack(
                _xvec_branch(cfg.num_shared, cfg.hidden_dim, cfg.pool_dim)[:-1],
                bn_momentum=bm,
                dtype=dt,
                name="xvec_branch",
            )(shared, train)
            merged = append_streams([xv, pre["bottleneck"]])
            h = TdnnLayer(
                TdnnSpec(cfg.pool_dim, (0,)), bn_momentum=bm, dtype=dt, name="tdnn5"
            )(merged.x, train)
            stream = Stream(h, merged.left, merged.right)
            pooled_mask = None
            if frame_mask is not None:
                ctx = stream.left + stream.right
                pooled_mask = frame_mask[:, ctx : ctx + stream.x.shape[1]]
            pooled = StatsPooling(name="stats")(stream.x, pooled_mask)
            out.update(
                SegmentHead(
                    cfg.embed_dim, cfg.num_speakers, bn_momentum=bm, dtype=dt,
                    name="segment"
                )(pooled, train)
            )
        return out
