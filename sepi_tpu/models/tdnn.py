"""TDNN building blocks: dilated conv1d layers + statistics pooling.

Replaces the nnet3 xconfig layer zoo the reference actually uses
(SURVEY.md §1 L4): `relu-batchnorm-layer` with `Append(x@c...)` splicing
(`steps/libs/nnet3/xconfig/basic_layers.py:622`) and `stats-layer`
`mean+stddev(0:1:1:N)` (`stats_layer.py:13-80`).

TPU-first design decisions:
- A splice `Append(x@-3,x@0,x@3)` is a kernel-3 / dilation-3 conv1d — one
  MXU GEMM per layer instead of nnet3's gather-then-affine graph.
- Convs are VALID-padded; temporal context is tracked *explicitly* per
  stream (the `Stream` wrapper) so multi-branch graphs (v3-v5) can append
  streams with different receptive fields by center-aligned cropping —
  the same accounting nnet3 performs with its model_left/right_context
  `vars` files (`prepare_nnet3_xconfig.sh:72-88`).
- Layer order is Kaldi's: affine -> ReLU -> batchnorm; the embedding tap
  is the *affine pre-activation* (`tdnn6.affine`,
  `extract_xvectors_new.sh:57-59`), so each layer optionally exposes it.
- Stats pooling is the masked streaming form: mean + stddev over valid
  frames only, with Kaldi's variance flooring; the same math backs the
  `lax.scan` unbounded-length extractor (extract.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TdnnSpec:
    """One relu-batchnorm-layer: output dim + temporal splice offsets.

    ``offsets`` must be uniformly spaced (all Kaldi recipes here are), so
    the splice lowers to kernel_size=len(offsets), dilation=spacing.
    """

    dim: int
    offsets: Tuple[int, ...] = (0,)

    def __post_init__(self):
        offs = self.offsets
        if len(offs) > 1:
            gaps = {offs[i + 1] - offs[i] for i in range(len(offs) - 1)}
            if len(gaps) != 1:
                raise ValueError(f"non-uniform splice offsets {offs}")

    @property
    def kernel_size(self) -> int:
        return len(self.offsets)

    @property
    def dilation(self) -> int:
        if len(self.offsets) <= 1:
            return 1
        return self.offsets[1] - self.offsets[0]

    @property
    def left(self) -> int:
        return max(-min(self.offsets), 0)

    @property
    def right(self) -> int:
        return max(max(self.offsets), 0)


def stack_context(specs: Sequence[TdnnSpec]) -> Tuple[int, int]:
    """Total (left, right) context of a spec chain (nnet3 `vars` analog)."""
    l = sum(s.left for s in specs)
    r = sum(s.right for s in specs)
    return l, r


@dataclasses.dataclass
class Stream:
    """A time series plus how many input frames it consumed on each side."""

    x: jnp.ndarray  # (B, T, C)
    left: int
    right: int

    def crop_to(self, left: int, right: int) -> "Stream":
        """Center-crop so the stream's context becomes (left, right)."""
        dl, dr = left - self.left, right - self.right
        if dl < 0 or dr < 0:
            raise ValueError(f"cannot expand context {self} -> ({left},{right})")
        t = self.x.shape[1]
        return Stream(self.x[:, dl : t - dr if dr else t, :], left, right)


def append_streams(streams: Sequence[Stream]) -> Stream:
    """xconfig `Append(a, b)` across branches: align by max context, concat."""
    left = max(s.left for s in streams)
    right = max(s.right for s in streams)
    aligned = [s.crop_to(left, right) for s in streams]
    return Stream(jnp.concatenate([s.x for s in aligned], axis=-1), left, right)


class TdnnLayer(nn.Module):
    """affine(conv1d) -> ReLU -> batchnorm, VALID padding.

    ``return_affine`` also yields the pre-activation (the embedding tap).
    """

    spec: TdnnSpec
    # EMA decay for inference statistics.  Kaldi's BatchNormComponent
    # accumulates *exact* dataset stats for test mode; an EMA with
    # moderate decay converges to the same thing over a few hundred
    # steps without a separate accumulation pass.
    bn_momentum: float = 0.95
    # MXU compute dtype: params stay float32, the conv computes in this
    # dtype ("bfloat16" for the fast path); batch-norm always reduces in
    # float32 for stable statistics.
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_affine: bool = False):
        s = self.spec
        affine = nn.Conv(
            features=s.dim,
            kernel_size=(s.kernel_size,),
            kernel_dilation=(s.dilation,),
            padding="VALID",
            use_bias=True,
            dtype=jnp.dtype(self.dtype),
            name="affine",
        )(x)
        h = nn.relu(affine)
        h = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-3,
            use_scale=True,
            use_bias=False,  # Kaldi batchnorm-component has no affine part
            dtype=jnp.float32,
            name="batchnorm",
        )(h)
        if return_affine:
            return h, affine
        return h


class TdnnStack(nn.Module):
    """A chain of TdnnLayers operating on a Stream."""

    specs: Tuple[TdnnSpec, ...]
    name_prefix: str = "tdnn"
    bn_momentum: float = 0.95
    dtype: str = "float32"

    @nn.compact
    def __call__(self, stream: Stream, train: bool = False) -> Stream:
        x, left, right = stream.x, stream.left, stream.right
        for i, spec in enumerate(self.specs):
            x = TdnnLayer(
                spec, bn_momentum=self.bn_momentum, dtype=self.dtype,
                name=f"{self.name_prefix}{i + 1}"
            )(x, train)
            left += spec.left
            right += spec.right
        return Stream(x, left, right)


class StatsPooling(nn.Module):
    """mean+stddev pooling over time (stats-layer mean+stddev(0:1:1:N)).

    Masked: padding frames contribute nothing; variance floored at
    ``var_floor`` like Kaldi's StatisticsExtraction/Pooling components.
    """

    var_floor: float = 1e-10

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        # x: (B, T, C); mask: (B, T) bool or None.
        if mask is None:
            mean = jnp.mean(x, axis=1)
            var = jnp.mean(x * x, axis=1) - mean * mean
        else:
            m = mask.astype(x.dtype)[..., None]
            count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
            mean = jnp.sum(x * m, axis=1) / count
            var = jnp.sum(x * x * m, axis=1) / count - mean * mean
        std = jnp.sqrt(jnp.maximum(var, self.var_floor))
        return jnp.concatenate([mean, std], axis=-1)


class SegmentHead(nn.Module):
    """Post-pooling head: tdnn6 -> tdnn7 -> output-layer.

    Returns (log-probs or logits, embedding_a, embedding_b) where the
    embeddings are the pre-activation affines of the two segment layers
    (`tdnn6.affine` — the standard x-vector — and `tdnn7.affine`).
    """

    embed_dim: int = 512
    num_classes: int = 0  # 0 = headless (extraction-only)
    bn_momentum: float = 0.95
    dtype: str = "float32"

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False):
        h, emb_a = TdnnLayer(
            TdnnSpec(self.embed_dim), bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="tdnn6"
        )(pooled[:, None, :], train, return_affine=True)
        h, emb_b = TdnnLayer(
            TdnnSpec(self.embed_dim), bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="tdnn7"
        )(h, train, return_affine=True)
        out = {"embedding_a": emb_a[:, 0, :], "embedding_b": emb_b[:, 0, :]}
        if self.num_classes:
            logits = nn.Dense(self.num_classes, name="output")(h[:, 0, :])
            out["logits"] = logits
        return out
