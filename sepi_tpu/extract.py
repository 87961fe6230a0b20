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
from functools import partial
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExtractConfig


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

    def __post_init__(self):
        self._fwd_cache: Dict[int, object] = {}

    def _forward(self, bucket_len: int):
        if bucket_len not in self._fwd_cache:
            kw = dict(self.model_kwargs or {})
            node = self.cfg.embedding_node

            @jax.jit
            def fwd(variables, feats, mask):
                out = self.model.apply(variables, feats, frame_mask=mask, train=False, **kw)
                return out[node]

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
