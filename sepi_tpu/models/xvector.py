"""The v2 x-vector model (run_xvector_new.sh:90-115).

Architecture (exact shapes from the reference xconfig):
  tdnn1 512 @ (-2..2) -> tdnn2 512 @ {-2,0,2} -> tdnn3 512 @ {-3,0,3}
  -> tdnn4 512 -> tdnn5 1500 -> stats(mean+stddev) -> tdnn6 512
  [embedding tap = tdnn6.affine] -> tdnn7 512 -> softmax(num_speakers).

Total frame-level context: left 7, right 7 — reproduced automatically by
the Stream context accounting.

The model exposes ``trunk`` (frame-level layers) and ``head``
(post-pooling layers) as separate applyable methods so extraction can
stream arbitrarily long utterances: accumulate (count, sum, sum-sq) over
trunk chunks, then run the head once on the pooled statistics
(extract.streaming_embed) — the TPU-native replacement for the
reference's bounded stats window + chunk-averaged embeddings.
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
    dtype: str = "float32"

    def setup(self):
        self.frames = TdnnStack(
            self.cfg.frame_specs, bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="frames",
        )
        self.stats = StatsPooling(name="stats")
        self.segment = SegmentHead(
            self.cfg.embed_dim,
            self.cfg.num_speakers,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="segment",
        )

    def trunk(self, feats: jnp.ndarray, train: bool = False) -> Stream:
        """Frame-level layers only: (B, T, D) -> Stream of (B, T', 1500)."""
        return self.frames(Stream(feats, 0, 0), train)

    def head(self, pooled: jnp.ndarray, train: bool = False):
        """Post-pooling layers: (B, 2*1500) -> embeddings / logits."""
        return self.segment(pooled, train)

    def __call__(
        self,
        feats: jnp.ndarray,  # (B, T, D)
        frame_mask: Optional[jnp.ndarray] = None,  # (B, T) over *input* frames
        train: bool = False,
    ):
        stream = self.trunk(feats, train)
        pooled_mask = None
        if frame_mask is not None:
            # Trunk output frame t consumes input frames [t, t+left+right],
            # so it is valid iff input frame t+left+right is valid.
            t_out = stream.x.shape[1]
            ctx = stream.left + stream.right
            pooled_mask = frame_mask[:, ctx : ctx + t_out]
        pooled = self.stats(stream.x, pooled_mask)
        return self.head(pooled, train)
