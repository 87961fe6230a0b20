"""Training-chunk samplers — the egs pipeline, redesigned for XLA.

The reference materializes multi-TB egs archives on disk
(`get_egs_xvec.sh`, `get_egs_am.sh`, `allocate_egs_new.py`) whose one load-
bearing invariant is *per-archive constant chunk length*
(`get_egs_xvec.sh:9-14`) — which is exactly XLA's static-shape requirement.
We keep the invariant but drop the disk round-trip: chunks are cut on the
fly from an in-memory/mmap feature store, bucketed into a small set of
static lengths so at most `num_buckets` programs ever compile.

Speaker-balance semantics preserved from `allocate_egs_new.py:252-268`:
- each sampling round visits every eligible speaker the same number of
  times (`num_repeats`),
- a draw picks a random utterance of that speaker with length >= chunk_len
  and a random offset (`get_random_utt` / `get_random_offset`),
- speakers with no long-enough utterance are skipped, not fatal (the
  "_new" fix, SURVEY.md §2.6).

The AM (senone) sampler mirrors `get_egs_am.sh`: frame-level examples,
`frames_per_eg=8` label frames per chunk plus model context, drawn
uniformly over frames.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Mapping, Optional, Tuple

import numpy as np

from ..config import ChunkConfig
from .manifest import Dataset


@dataclasses.dataclass
class ChunkBatch:
    """One fixed-length minibatch: feats (B, L, D) f32, labels (B,) i32."""

    feats: np.ndarray
    labels: np.ndarray
    chunk_len: int
    task: str = "xvec"


def bucket_lengths(cfg: ChunkConfig) -> List[int]:
    """Distinct static chunk lengths spanning [min, max] evenly."""
    if cfg.num_buckets <= 1:
        return [cfg.max_chunk_len]
    return sorted(
        {
            int(round(l))
            for l in np.linspace(cfg.min_chunk_len, cfg.max_chunk_len, cfg.num_buckets)
        }
    )


def diagnostic_lengths(cfg: ChunkConfig, num: int = 3) -> List[int]:
    """Geometric series min->max for diagnostics (allocate_egs_new.py:193-203)."""
    ratio = (cfg.max_chunk_len / cfg.min_chunk_len) ** (1.0 / max(num - 1, 1))
    return sorted({int(round(cfg.min_chunk_len * ratio**i)) for i in range(num)})


class ChunkSampler:
    """Speaker-balanced bucketed chunk sampler over a feature store.

    Args:
      features: utt_id -> (T, D) float32 array (CMVN'd, silence-stripped).
      dataset: manifest supplying spk structure.
      cfg: chunk length policy.
      batch_size: chunks per batch (all same length).
      seed: deterministic sampling (reference srand=123).
    """

    def __init__(
        self,
        features: Mapping[str, np.ndarray],
        dataset: Dataset,
        cfg: ChunkConfig = ChunkConfig(),
        batch_size: int = 64,
        seed: int = 123,
        block_size: int = 1,
        label_map: Optional[Mapping[str, int]] = None,
    ):
        self.cfg = cfg
        self.batch_size = batch_size
        # Batches per constant-length run when iterating.  The reference
        # holds chunk length constant per *archive* (hundreds of
        # minibatches, get_egs_xvec.sh:9-14); block_size>1 restores that
        # run structure so superstep dispatch can stack same-shape
        # batches (train/trainer.py).
        self.block_size = max(1, block_size)
        self.rng = np.random.default_rng(seed)
        # label_map must be passed at construction when this sampler sees
        # a SUBSET of the training population (e.g. a held-out valid
        # split): per-speaker state below is keyed by these labels, so a
        # subset-local map would emit labels inconsistent with the model
        # head.
        self.label_map = dict(label_map) if label_map else dataset.speaker_label_map()
        self.num_speakers = len(self.label_map)
        self.feat_dim = next(iter(features.values())).shape[1]
        self.buckets = bucket_lengths(cfg)
        # Per speaker: list of (utt_id, length) for eligibility checks.
        self._spk_utts: Dict[int, List[Tuple[str, int]]] = {}
        self._features = features
        for spk, utt_ids in dataset.spk2utt.items():
            lab = self.label_map[spk]
            rows = [(u, features[u].shape[0]) for u in utt_ids if u in features]
            if rows:
                self._spk_utts[lab] = rows
        # Persistent per-bucket speaker rotations: one full pass visits
        # every eligible speaker exactly once (the num_repeats-per-speaker
        # accounting of allocate_egs_new.py:252-268 — an archive holds
        # num_repeats examples of EVERY speaker, not a multinomial draw).
        self._queues: Dict[int, List[int]] = {}
        self.draw_counts: Dict[int, int] = {lab: 0 for lab in self._spk_utts}

    def eligible_speakers(self, chunk_len: int) -> List[int]:
        return [
            lab
            for lab, rows in self._spk_utts.items()
            if any(n >= chunk_len for _, n in rows)
        ]

    def _next_speakers(self, chunk_len: int, count: int) -> List[int]:
        """Draw ``count`` speakers from the bucket's persistent rotation,
        reshuffling each time the eligible list is exhausted — exact
        per-speaker balance over any whole number of passes."""
        out: List[int] = []
        q = self._queues.get(chunk_len, [])
        while len(out) < count:
            if not q:
                eligible = self.eligible_speakers(chunk_len)
                if not eligible:
                    raise ValueError(
                        f"no speaker has an utterance >= {chunk_len} frames"
                    )
                q = list(self.rng.permutation(eligible))
            out.append(int(q.pop()))
        self._queues[chunk_len] = q
        return out

    def sample_batch(self, chunk_len: Optional[int] = None) -> ChunkBatch:
        if chunk_len is None:
            chunk_len = int(self.rng.choice(self.buckets))
        feats = np.zeros((self.batch_size, chunk_len, self.feat_dim), np.float32)
        labels = np.zeros((self.batch_size,), np.int32)
        for b, lab in enumerate(self._next_speakers(chunk_len, self.batch_size)):
            rows = [(u, n) for u, n in self._spk_utts[lab] if n >= chunk_len]
            utt, n = rows[int(self.rng.integers(len(rows)))]
            off = int(self.rng.integers(n - chunk_len + 1))
            feats[b] = self._features[utt][off : off + chunk_len]
            labels[b] = lab
            self.draw_counts[lab] += 1
        return ChunkBatch(feats, labels, chunk_len, task="xvec")

    def __iter__(self) -> Iterator[ChunkBatch]:
        while True:
            chunk_len = int(self.rng.choice(self.buckets))
            for _ in range(self.block_size):
                yield self.sample_batch(chunk_len)

    def diagnostic_batches(self, num_lengths: int = 3) -> List[ChunkBatch]:
        """Held-out style diagnostics at geometric lengths (SURVEY.md §4.2)."""
        return [
            self.sample_batch(l) for l in diagnostic_lengths(self.cfg, num_lengths)
        ]


@dataclasses.dataclass
class FrameBatch:
    """AM example batch: feats (B, L, D), labels (B, L) i32, mask (B, L)."""

    feats: np.ndarray
    labels: np.ndarray
    label_mask: np.ndarray
    task: str = "am"


class FrameSampler:
    """Frame-level senone sampler (get_egs_am.sh semantics).

    ``alignments[utt]`` is an int32 (T,) senone stream aligned with
    ``features[utt]`` rows (the select-voiced-ali invariant).  Each example
    is a window of ``chunk_len`` label frames; the consumer's TDNN sees the
    needed temporal context via its own convolution padding.
    """

    def __init__(
        self,
        features: Mapping[str, np.ndarray],
        alignments: Mapping[str, np.ndarray],
        chunk_len: int = 8,
        batch_size: int = 256,
        seed: int = 123,
        context: Tuple[int, int] = (0, 0),
    ):
        self.chunk_len = chunk_len
        self.batch_size = batch_size
        if isinstance(context, int):
            context = (context, context)
        self.context = context  # (left, right) model context
        self.rng = np.random.default_rng(seed)
        self._rows: List[Tuple[str, int]] = []
        self._features = features
        self._ali = {}
        min_len = chunk_len + context[0] + context[1]
        for utt, f in features.items():
            if utt not in alignments:
                continue
            a = alignments[utt]
            if len(a) != f.shape[0]:
                raise ValueError(
                    f"{utt}: alignment length {len(a)} != num frames {f.shape[0]}"
                    " (select-voiced-ali invariant violated)"
                )
            if f.shape[0] >= min_len:
                self._rows.append((utt, f.shape[0]))
                self._ali[utt] = a
        if not self._rows:
            raise ValueError("no utterance long enough for AM examples")
        self.feat_dim = next(iter(features.values())).shape[1]
        # Sample utterances proportional to their frame count (uniform over frames).
        tot = sum(n for _, n in self._rows)
        self._probs = np.array([n / tot for _, n in self._rows])

    def sample_batch(self) -> FrameBatch:
        lc, rc = self.context
        l = self.chunk_len + lc + rc
        feats = np.zeros((self.batch_size, l, self.feat_dim), np.float32)
        labels = np.zeros((self.batch_size, self.chunk_len), np.int32)
        mask = np.ones((self.batch_size, self.chunk_len), bool)
        idx = self.rng.choice(len(self._rows), size=self.batch_size, p=self._probs)
        for b, i in enumerate(idx):
            utt, n = self._rows[int(i)]
            off = int(self.rng.integers(n - l + 1))
            feats[b] = self._features[utt][off : off + l]
            labels[b] = self._ali[utt][off + lc : off + lc + self.chunk_len]
        return FrameBatch(feats, labels, mask)

    def __iter__(self) -> Iterator[FrameBatch]:
        while True:
            yield self.sample_batch()


class MultitaskInterleaver:
    """nnet3-copy-cvector-egs equivalent: stochastic two-stream interleave.

    Draws from the AM or xvec stream with probability proportional to the
    *remaining* example budget of each (`SelectExample`,
    `nnet3-copy-cvector-egs.cc:294-301`), exhausting both streams together
    over an epoch (lines 476-477).  Loss weights (`--am-weight`,
    `--xvec-weight`) ride along on the batch for the trainer to apply.
    """

    def __init__(
        self,
        am_sampler: FrameSampler,
        xvec_sampler: ChunkSampler,
        num_am_batches: int,
        num_xvec_batches: int,
        am_weight: float = 1.0,
        xvec_weight: float = 1.0,
        seed: int = 123,
        block_size: int = 1,
    ):
        self.am_sampler = am_sampler
        self.xvec_sampler = xvec_sampler
        self.num_am = num_am_batches
        self.num_xvec = num_xvec_batches
        self.am_weight = am_weight
        self.xvec_weight = xvec_weight
        self.rng = np.random.default_rng(seed)
        # Stream selection granularity: with block_size=K the
        # proportional-to-remaining draw picks a stream once per K
        # batches (capped by that stream's remaining budget), emitting a
        # same-task same-shape run superstep dispatch can stack.  The
        # reference itself coarsens interleaving downstream of the copy
        # stage (nnet3-merge-egs groups same-size egs into single-task
        # minibatches), so expected am:xvec ratios and exhaust-together
        # accounting are unchanged.
        self.block_size = max(1, block_size)

    def __iter__(self):
        rem_am, rem_xvec = self.num_am, self.num_xvec
        while rem_am > 0 or rem_xvec > 0:
            p_am = rem_am / (rem_am + rem_xvec)
            if self.rng.random() < p_am:
                k = min(self.block_size, rem_am)
                rem_am -= k
                for _ in range(k):
                    yield self.am_sampler.sample_batch(), self.am_weight
            else:
                k = min(self.block_size, rem_xvec)
                rem_xvec -= k
                chunk_len = int(
                    self.xvec_sampler.rng.choice(self.xvec_sampler.buckets)
                )
                for _ in range(k):
                    yield self.xvec_sampler.sample_batch(chunk_len), self.xvec_weight
