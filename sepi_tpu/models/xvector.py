"""The v2 x-vector model (run_xvector_new.sh:90-115).

Architecture (exact shapes from the reference xconfig):
  tdnn1 512 @ (-2..2) -> tdnn2 512 @ {-2,0,2} -> tdnn3 512 @ {-3,0,3}
  -> tdnn4 512 -> tdnn5 1500 -> stats(mean+stddev) -> tdnn6 512
  [embedding tap = tdnn6.affine] -> tdnn7 512 -> softmax(num_speakers).

Total frame-level context: left 7, right 7 — reproduced automatically by
the Stream context accounting.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .tdnn import SegmentHead, StatsPooling, Stream, TdnnSpec, TdnnStack, stack_context


@dataclasses.dataclass(frozen=True)
class XVectorConfig:
    feat_dim: int = 23
    num_speakers: int = 0
    frame_specs: Tuple[TdnnSpec, ...] = (
        TdnnSpec(512, (-2, -1, 0, 1, 2)),
        TdnnSpec(512, (-2, 0, 2)),
        TdnnSpec(512, (-3, 0, 3)),
        TdnnSpec(512, (0,)),
        TdnnSpec(1500, (0,)),
    )
    embed_dim: int = 512

    @property
    def context(self) -> Tuple[int, int]:
        return stack_context(self.frame_specs)

    @property
    def min_frames(self) -> int:
        l, r = self.context
        return l + r + 1


V2_XVECTOR = XVectorConfig()


class XVector(nn.Module):
    cfg: XVectorConfig
    bn_momentum: float = 0.95

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # (B, T, D)
        frame_mask: Optional[jnp.ndarray] = None,  # (B, T) over *input* frames
        train: bool = False,
    ):
        stream = TdnnStack(
            self.cfg.frame_specs, bn_momentum=self.bn_momentum, name="frames"
        )(Stream(feats, 0, 0), train)
        pooled_mask = None
        if frame_mask is not None:
            # Trunk output frame t consumes input frames [t, t+left+right],
            # so it is valid iff input frame t+left+right is valid.
            t_out = stream.x.shape[1]
            ctx = stream.left + stream.right
            pooled_mask = frame_mask[:, ctx : ctx + t_out]
        pooled = StatsPooling(name="stats")(stream.x, pooled_mask)
        return SegmentHead(
            self.cfg.embed_dim,
            self.cfg.num_speakers,
            bn_momentum=self.bn_momentum,
            name="segment",
        )(pooled, train)
