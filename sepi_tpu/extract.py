"""Embedding extraction — the inference path (SURVEY.md §1 L7, §3.4).

Replaces `sid/nnet3/xvector/extract_xvectors_new.sh` +
`nnet3-xvector-compute`:

- the "output-node rewrite to an inner layer" (`extract.config`,
  `extract_xvectors_new.sh:57-59`) is just selecting which model output
  to read (`embedding_a` == tdnn6.affine, `embedding_b` == tdnn7.affine),
- chunked inference (`--min-chunk-size=25 --chunk-size=10000`, lines
  86-93): utterances split into <=chunk_size pieces, each forwarded, the
  per-chunk embeddings averaged weighted by chunk length,
- `ivector-mean` speaker averaging (lines 102-108).

TPU design: chunks are padded up to a small ladder of static bucket
lengths and batched per bucket, so a whole corpus compiles at most
len(buckets) programs and each forward is a dense masked batch on the
MXU.  The frame mask rides through StatsPooling, so padding frames never
contaminate the statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExtractConfig


_STREAM_JIT_CACHE: Dict = {}


def chunk_spans(num_frames: int, cfg: ExtractConfig, min_frames: int) -> List[Tuple[int, int]]:
    """(offset, length) chunks per nnet3-xvector-compute semantics."""
    lo = max(cfg.min_chunk_size, min_frames)
    if num_frames < lo:
        return []
    size = min(cfg.chunk_size, num_frames)
    spans = []
    off = 0
    while off < num_frames:
        length = min(size, num_frames - off)
        if length < lo:
            break  # trailing remnant shorter than min chunk: dropped
        spans.append((off, length))
        off += length
    return spans


def bucket_ladder(cfg: ExtractConfig, min_frames: int) -> List[int]:
    """Static chunk-length buckets: geometric from min to chunk_size."""
    lo = max(cfg.min_chunk_size, min_frames)
    out = [lo]
    while out[-1] < cfg.chunk_size:
        out.append(min(out[-1] * 2, cfg.chunk_size))
    return out


@dataclasses.dataclass
class EmbeddingExtractor:
    """Batched bucketed extractor for any model exposing embeddings.

    Args:
      model: a flax module whose __call__(feats, frame_mask, train) dict
        contains cfg.embedding_node (models/*.py all do).
      variables: {'params':..., 'batch_stats':...}.
      min_frames: the model's receptive field l+r+1 (hard minimum chunk).
      model_kwargs: e.g. {'task': 'xvec'} for multitask models.
    """

    model: object
    variables: Mapping
    cfg: ExtractConfig = ExtractConfig()
    min_frames: int = 15
    model_kwargs: Optional[Dict] = None
    # Optional jax.sharding.Mesh: batches shard over the 'data' axis
    # (GSPMD) — the TPU-native version of the reference's nj=32
    # `run.pl` extraction fan-out (`extract_xvectors_new.sh:91-93`),
    # with ICI instead of the filesystem.  batch_size must be divisible
    # by the data-axis size.
    mesh: object = None

    def __post_init__(self):
        self._fwd_cache: Dict[int, object] = {}
        if self.mesh is not None and self.cfg.batch_size % self.mesh.shape["data"]:
            raise ValueError(
                f"batch_size {self.cfg.batch_size} not divisible by data "
                f"axis {self.mesh.shape['data']}"
            )

    def _forward(self, bucket_len: int):
        if bucket_len not in self._fwd_cache:
            kw = dict(self.model_kwargs or {})
            node = self.cfg.embedding_node

            def fwd(variables, feats, mask):
                out = self.model.apply(variables, feats, frame_mask=mask, train=False, **kw)
                return out[node]

            if self.mesh is None:
                fwd = jax.jit(fwd)
            else:
                from .parallel.mesh import batch_sharded, replicated

                rep, sh = replicated(self.mesh), batch_sharded(self.mesh)
                fwd = jax.jit(fwd, in_shardings=(rep, sh, sh), out_shardings=rep)
            self._fwd_cache[bucket_len] = fwd
        return self._fwd_cache[bucket_len]

    def extract_utterances(
        self, features: Mapping[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        """utt_id -> (T, D) features  =>  utt_id -> embedding.

        Work is grouped by bucket so each compiled program sees dense
        batches; per-utterance chunk embeddings are length-weighted
        averaged (nnet3-xvector-compute's DivideByCount path).
        """
        ladder = bucket_ladder(self.cfg, self.min_frames)
        # plan: bucket_len -> list of (utt, offset, length)
        plan: Dict[int, List[Tuple[str, int, int]]] = {b: [] for b in ladder}
        skipped = []
        for utt, f in features.items():
            spans = chunk_spans(f.shape[0], self.cfg, self.min_frames)
            if not spans:
                skipped.append(utt)
                continue
            for off, length in spans:
                b = next(b for b in ladder if b >= length)
                plan[b].append((utt, off, length))
        if skipped:
            raise ValueError(
                f"{len(skipped)} utterances shorter than min chunk "
                f"({max(self.cfg.min_chunk_size, self.min_frames)} frames), "
                f"e.g. {skipped[:3]}"
            )

        feat_dim = next(iter(features.values())).shape[1]
        sums: Dict[str, np.ndarray] = {}
        weights: Dict[str, float] = {}
        bs = self.cfg.batch_size
        for b, items in plan.items():
            if not items:
                continue
            fwd = self._forward(b)
            for i0 in range(0, len(items), bs):
                group = items[i0 : i0 + bs]
                pad_n = bs - len(group)
                feats = np.zeros((bs, b, feat_dim), np.float32)
                mask = np.zeros((bs, b), bool)
                for j, (utt, off, length) in enumerate(group):
                    feats[j, :length] = features[utt][off : off + length]
                    mask[j, :length] = True
                emb = np.asarray(fwd(self.variables, feats, mask))
                for j, (utt, off, length) in enumerate(group):
                    if utt in sums:
                        sums[utt] = sums[utt] + length * emb[j]
                        weights[utt] += length
                    else:
                        sums[utt] = length * emb[j]
                        weights[utt] = float(length)
        return {u: sums[u] / weights[u] for u in sums}


def streaming_embed(
    model,
    variables: Mapping,
    feats: np.ndarray,  # (T, D), arbitrarily long
    chunk: int = 10000,
    var_floor: float = 1e-10,
) -> np.ndarray:
    """Exact single-pass embedding of an unbounded-length utterance.

    The reference caps stats pooling at 10 000 frames and averages
    per-chunk embeddings (`extract_xvectors_new.sh:86-93`) — an
    approximation forced by nnet3's bounded stats window.  With explicit
    running moments there is no cap: trunk chunks (overlapped by the
    receptive field so every trunk frame is computed exactly once) feed
    running (count, sum, sum-of-squares); the segment head runs once on
    the exact whole-utterance statistics.  Requires a model exposing
    ``trunk``/``head`` methods (models.XVector).
    """
    probe = model.apply(variables, jnp.asarray(feats[:64][None], jnp.float32),
                        method="trunk")
    left, right = probe.left, probe.right
    ctx = left + right
    t = feats.shape[0]
    if t <= ctx:
        raise ValueError(f"utterance too short: {t} <= receptive field {ctx}")

    key = (id(model), "trunk")
    if key not in _STREAM_JIT_CACHE:
        _STREAM_JIT_CACHE[key] = jax.jit(
            lambda v, f: model.apply(v, f, method="trunk").x
        )
    trunk = _STREAM_JIT_CACHE[key]
    count = 0.0
    s1 = s2 = None
    # chunk starts step by (chunk - ctx) so trunk outputs tile exactly
    step = max(chunk - ctx, 1)
    for off in range(0, t - ctx, step):
        piece = feats[off : off + chunk]
        if piece.shape[0] <= ctx:
            break
        pad = chunk - piece.shape[0]
        n_valid = piece.shape[0] - ctx
        if pad:
            piece = np.pad(piece, ((0, pad), (0, 0)))
        out = np.asarray(trunk(variables, jnp.asarray(piece[None], jnp.float32)))[0]
        out = out[:n_valid]
        count += n_valid
        if s1 is None:
            s1 = out.sum(axis=0)
            s2 = (out.astype(np.float64) ** 2).sum(axis=0)
        else:
            s1 = s1 + out.sum(axis=0)
            s2 = s2 + (out.astype(np.float64) ** 2).sum(axis=0)
    mean = s1 / count
    var = np.maximum(s2 / count - mean.astype(np.float64) ** 2, var_floor)
    pooled = np.concatenate([mean, np.sqrt(var)]).astype(np.float32)
    hkey = (id(model), "head")
    if hkey not in _STREAM_JIT_CACHE:
        _STREAM_JIT_CACHE[hkey] = jax.jit(
            lambda v, p: model.apply(v, p, method="head")["embedding_a"]
        )
    head = _STREAM_JIT_CACHE[hkey]
    return np.asarray(head(variables, jnp.asarray(pooled[None])))[0]


def speaker_mean(
    utt_embeddings: Mapping[str, np.ndarray], spk2utt: Mapping[str, List[str]]
) -> Tuple[Dict[str, np.ndarray], Dict[str, int]]:
    """ivector-mean per speaker (+ num_utts, used by PLDA multi-enroll)."""
    out, counts = {}, {}
    for spk, utts in spk2utt.items():
        vecs = [utt_embeddings[u] for u in utts if u in utt_embeddings]
        if not vecs:
            continue
        out[spk] = np.mean(vecs, axis=0)
        counts[spk] = len(vecs)
    return out, counts
