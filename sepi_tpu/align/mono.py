"""Monophone GMM-HMM forced aligner — the s5-equivalent alignment provider.

The reference's entire `egs/sre/s5` pipeline (SURVEY.md §3.5: mono ->
tri1..tri6a + fMLLR, `steps/train_mono.sh`, `steps/align_fmllr.sh`)
exists to produce ONE artifact the phonetic variants consume: per-frame
senone alignments (`exp/tri6a_4k_ali`).  Per SURVEY.md §7 hard part 1,
the framework treats alignments as an input artifact with a documented
schema (utt -> int32 frame labels), and this module provides the native
producer: a monophone 3-state GMM-HMM trained by Viterbi EM with forced
alignment — no decoding graph, no language model (alignment against a
known transcript never needs one).

Alignment graph per utterance (linear, compile-friendly):
  [sil] w1_phones [opt sil] w2_phones [opt sil] ... wN_phones [sil]
each phone = ``states_per_phone`` left-to-right states with self-loops;
optional inter-word silences are skippable via skip arcs.  Every state
has <= 3 predecessors (self, previous, skip), so Viterbi is a
`lax.scan` over time with a dense (S, 3) predecessor table — gather-free
on the tiny state axis, batched across utterances of one padded bucket.

pdf-ids are (phone_index * states_per_phone + state) — monophone
"senones".  Emissions are per-pdf diagonal GMMs evaluated as one
(N, num_pdf * comps) GEMM + grouped logsumexp.

Deviations from Kaldi mono (documented): Viterbi training instead of
full forward-backward accumulation (standard and adequate for
alignment).  Context-dependent tying lives in align.tied; fMLLR
speaker-adaptive transforms in align.fmllr (the SAT pass of
steps/align_fmllr.sh); both build on this module's graphs and Viterbi.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SIL = "sil"
_NEG = -1e30


@dataclasses.dataclass
class Lexicon:
    """word -> phone sequence; phone inventory fixed at construction."""

    pron: Dict[str, Tuple[str, ...]]
    phones: Tuple[str, ...]  # includes SIL at index 0

    @classmethod
    def from_dict(cls, pron: Mapping[str, Sequence[str]]) -> "Lexicon":
        phones = sorted({p for ps in pron.values() for p in ps} - {SIL})
        return cls({w: tuple(ps) for w, ps in pron.items()}, (SIL, *phones))

    def phone_index(self, phone: str) -> int:
        return self.phones.index(phone)

    def words_to_phones(self, words: Sequence[str]) -> List[str]:
        out: List[str] = []
        for w in words:
            if w not in self.pron:
                raise KeyError(f"OOV word {w!r}")
            out.extend(self.pron[w])
        return out


@dataclasses.dataclass
class UttGraph:
    """Linear alignment graph: per-state pdf ids + predecessor table."""

    pdf: np.ndarray  # (S,) int32
    preds: np.ndarray  # (S, 3) int32, -1 = absent; col 0 is always self
    final_states: np.ndarray  # states allowed to end the utterance
    num_states: int


def build_graph(
    lex: Lexicon,
    words: Sequence[str],
    states_per_phone: int = 3,
    optional_silence: bool = True,
) -> UttGraph:
    """[sil] w1 [sil?] w2 ... wN [sil] with skippable inter-word sil."""
    blocks: List[Tuple[int, bool]] = [(0, False)]  # (phone_idx, optional?)
    word_phones = [
        [lex.phone_index(p) for p in lex.pron[w]] if w in lex.pron else None
        for w in words
    ]
    for i, ph in enumerate(word_phones):
        if ph is None:
            raise KeyError(f"OOV word {words[i]!r}")
        for p in ph:
            blocks.append((p, False))
        if optional_silence and i < len(word_phones) - 1:
            blocks.append((0, True))
    blocks.append((0, False))

    pdf: List[int] = []
    preds: List[List[int]] = []
    prev_exits: List[int] = []  # states that can transition into next block
    for phone, optional in blocks:
        entry = len(pdf)
        for j in range(states_per_phone):
            s = len(pdf)
            pdf.append(phone * states_per_phone + j)
            p = [s]  # self loop
            if j > 0:
                p.append(s - 1)
            else:
                p.extend(prev_exits)
            preds.append((p + [-1, -1, -1])[:3])
        exit_state = len(pdf) - 1
        if optional:
            # next block may come from this sil OR skip it entirely
            prev_exits = [exit_state] + prev_exits[:1]
        else:
            prev_exits = [exit_state]
    # first block has no external predecessor: strip the dangling entries
    preds[0] = [0, -1, -1]
    return UttGraph(
        pdf=np.asarray(pdf, np.int32),
        preds=np.asarray(preds, np.int32),
        final_states=np.asarray([len(pdf) - 1], np.int32),
        num_states=len(pdf),
    )


@dataclasses.dataclass
class MonoAligner:
    """Per-pdf diagonal-GMM emissions + per-state transition log-probs.

    (Not a jit argument — only its arrays cross into jitted code.)"""

    means: jnp.ndarray  # (P, C, D)
    vars: jnp.ndarray  # (P, C, D)
    mix_w: jnp.ndarray  # (P, C) log mixture weights
    loop_logp: jnp.ndarray  # (P,) self-loop log-prob
    phones: Tuple[str, ...] = ()
    states_per_phone: int = 3

    @property
    def num_pdf(self) -> int:
        return self.means.shape[0]

    @property
    def num_senones(self) -> int:
        return self.num_pdf

    def log_emissions(self, x: jnp.ndarray) -> jnp.ndarray:
        """(T, D) -> (T, P): flattened diag-GMM GEMM + grouped logsumexp."""
        p, c, d = self.means.shape
        means = self.means.reshape(p * c, d)
        vars_ = self.vars.reshape(p * c, d)
        inv_v = 1.0 / vars_
        const = self.mix_w.reshape(p * c) - 0.5 * (
            jnp.sum(jnp.log(vars_), axis=1)
            + d * jnp.log(2.0 * jnp.pi)
            + jnp.sum(means**2 * inv_v, axis=1)
        )
        lin = jnp.dot(x, (means * inv_v).T, preferred_element_type=jnp.float32)
        quad = jnp.dot(x * x, (0.5 * inv_v).T, preferred_element_type=jnp.float32)
        ll = const[None] + lin - quad  # (T, P*C)
        return jax.scipy.special.logsumexp(ll.reshape(-1, p, c), axis=2)


@partial(jax.jit, static_argnames=("s_pad", "skip"))
def _viterbi(
    emissions: jnp.ndarray,  # (T, P) log emissions
    t_len: jnp.ndarray,  # () true frame count
    pdf: jnp.ndarray,  # (s_pad,) padded with 0
    preds: jnp.ndarray,  # (s_pad, 3) padded with -1 (backtrace table)
    trans: jnp.ndarray,  # (s_pad, 3) log transition for each pred arc
    s_pad: int,
    skip: int = 4,
):
    """Banded Viterbi; returns (best final score, backpointers (T, S)).

    The linear graph guarantees every predecessor is one of
    {s, s-1, s-skip} (self-loop, advance, optional-silence skip), so the
    recursion is three shifted adds — no gathers; invalid arcs carry
    -inf transitions, which also masks the shift wrap-around.
    """
    state_emit = emissions[:, pdf]  # (T, S)

    init = jnp.full((s_pad,), _NEG).at[0].set(state_emit[0, 0])
    neg = jnp.full((1,), _NEG)
    negk = jnp.full((skip,), _NEG)

    def step(delta, emit_t):
        c0 = delta + trans[:, 0]
        c1 = jnp.concatenate([neg, delta[:-1]]) + trans[:, 1]
        c2 = jnp.concatenate([negk, delta[:-skip]]) + trans[:, 2]
        cand = jnp.stack([c0, c1, c2], axis=1)  # (S, 3)
        best = jnp.max(cand, axis=1)
        bp = jnp.argmax(cand, axis=1).astype(jnp.int8)
        return best + emit_t, bp

    def scan_fn(carry, xs):
        delta, t = carry
        emit_t, = xs
        new_delta, bp = step(delta, emit_t)
        # frames beyond t_len: freeze
        keep = t < t_len
        delta = jnp.where(keep, new_delta, delta)
        bp = jnp.where(keep, bp, jnp.zeros_like(bp))
        return (delta, t + 1), bp

    (delta, _), bps = jax.lax.scan(
        scan_fn, (init, jnp.asarray(1)), (state_emit[1:],)
    )
    return delta, bps  # bps: (T-1, S)


def _backtrace(
    bps: np.ndarray, preds: np.ndarray, final_state: int, t_len: int
) -> np.ndarray:
    s = final_state
    path = np.zeros(t_len, np.int32)
    path[-1] = s
    for t in range(t_len - 2, -1, -1):
        s = preds[s, bps[t, s]]
        path[t] = s
    return path


class _GraphCache:
    def __init__(self, lex: Lexicon, states_per_phone: int):
        self.lex = lex
        self.spp = states_per_phone
        self._cache: Dict[Tuple[str, ...], UttGraph] = {}

    def get(self, words: Sequence[str]) -> UttGraph:
        key = tuple(words)
        if key not in self._cache:
            self._cache[key] = build_graph(self.lex, words, self.spp)
        return self._cache[key]


def _round_up(n: int, step: int = 32) -> int:
    return -(-n // step) * step


def _bucket_len(n: int, base: int = 256, ratio: float = 1.25) -> int:
    """Geometric padded-length ladder for the batched alignment path.

    A linear 64-frame grid mints ~36 distinct XLA programs across a
    2 s–25 s corpus; on a remote-compile backend each program costs tens
    of seconds the first time.  A 1.25× ladder covers the same range in
    ~12 shapes, and since utterances are length-sorted into groups the
    realized padding waste stays far below the 25% worst case (same
    scheme as the frontend's `ops.features` bucket ladder)."""
    if n <= base:
        return _round_up(n, 64)
    b = float(base)
    while b < n:
        b *= ratio
    return _round_up(int(b), 64)


@jax.jit
def _emissions_batch(means, vars_, mix_w, feats):
    """(B, T, D) -> (B, T, P) log diag-GMM emissions, params as ARGUMENTS.

    EM re-estimates the GMM every iteration.  Jitting a closure over the
    aligner embeds its arrays as HLO *constants*, so every length bucket
    recompiles every iteration — at corpus scale through a
    remote-compile backend that is hours of compiles for zero new
    machine code.  With the parameters as arguments one program per
    (B, T) shape serves the entire EM run, the tied-tree stage and the
    refinement rounds (same rule as the training step: stable HLO,
    data-varying operands)."""
    p, c, d = means.shape
    m = means.reshape(p * c, d)
    v = vars_.reshape(p * c, d)
    inv_v = 1.0 / v
    const = mix_w.reshape(p * c) - 0.5 * (
        jnp.sum(jnp.log(v), axis=1)
        + d * jnp.log(2.0 * jnp.pi)
        + jnp.sum(m * m * inv_v, axis=1)
    )
    lin = jnp.dot(feats, (m * inv_v).T, preferred_element_type=jnp.float32)
    quad = jnp.dot(feats * feats, (0.5 * inv_v).T,
                   preferred_element_type=jnp.float32)
    ll = const[None, None] + lin - quad  # (B, T, P*C)
    b, t = feats.shape[:2]
    return jax.scipy.special.logsumexp(ll.reshape(b, t, p, c), axis=3)


@lru_cache(maxsize=None)
def _viterbi_reference_jit():
    # module-level-cached so repeated align_graphs calls retrace at most
    # once per shape instead of re-jitting a fresh closure per call
    from .viterbi_pallas import viterbi_batch_reference

    return jax.jit(viterbi_batch_reference, static_argnames=("skip",))


def align_utterance(
    aligner: MonoAligner,
    graph: UttGraph,
    feats: np.ndarray,
    return_states: bool = False,
) -> np.ndarray:
    """Force-align one utterance -> per-frame pdf ids (T,).

    With ``return_states`` also returns the per-frame graph-state path,
    from which block/phone identity is recoverable even when the graph's
    pdf table holds tied senones (`align.tied.context_graph`)."""
    t_len = feats.shape[0]
    s_pad = _round_up(graph.num_states)
    pdf = np.zeros(s_pad, np.int32)
    pdf[: graph.num_states] = graph.pdf
    preds = np.full((s_pad, 3), -1, np.int32)
    preds[: graph.num_states] = graph.preds
    loop = np.asarray(aligner.loop_logp)
    trans = np.full((s_pad, 3), _NEG, np.float32)
    for s in range(graph.num_states):
        for j, p in enumerate(graph.preds[s]):
            if p < 0:
                continue
            if p == s:
                trans[s, j] = loop[graph.pdf[s]]
            else:
                # advance arc: log(1 - exp(loop)) of the source state
                lp = loop[graph.pdf[p]]
                trans[s, j] = float(np.log1p(-np.exp(min(lp, -1e-4))))
    # pad the time axis to a bucket so utterances share compiled programs
    t_pad = _round_up(t_len, 64)
    feats_p = np.zeros((t_pad, feats.shape[1]), np.float32)
    feats_p[:t_len] = feats
    # shift-based recursion invariant: preds columns are {s, s-1, s-skip}
    skip = aligner.states_per_phone + 1
    ss = np.arange(graph.num_states)
    assert np.all((graph.preds[:, 1] == -1) | (graph.preds[:, 1] == ss - 1))
    assert np.all((graph.preds[:, 2] == -1) | (graph.preds[:, 2] == ss - skip))
    emissions = aligner.log_emissions(jnp.asarray(feats_p))
    delta, bps = _viterbi(
        emissions,
        jnp.asarray(t_len),
        jnp.asarray(pdf),
        jnp.asarray(preds),
        jnp.asarray(trans),
        s_pad,
        skip,
    )
    final = int(graph.final_states[0])
    if float(np.asarray(delta)[final]) < _NEG / 2:
        raise ValueError(
            f"unalignable utterance: {t_len} frames for {graph.num_states} states"
        )
    states = _backtrace(np.asarray(bps), preds, final, t_len)
    if return_states:
        return pdf[states], states
    return pdf[states]


def _flat_start_alignment(graph: UttGraph, t_len: int) -> np.ndarray:
    """Uniform segmentation over the mandatory (non-optional-sil) path."""
    # mandatory path = states reachable without optional blocks; for the
    # linear graph this is simply all states minus skippable sil blocks.
    # Flat start just spreads frames across ALL states — good enough to
    # bootstrap EM.
    s = graph.num_states
    idx = np.minimum((np.arange(t_len) * s) // max(t_len, 1), s - 1)
    return graph.pdf[idx]


def _estimate_from_alignment(
    features: Mapping[str, np.ndarray],
    alignments: Mapping[str, np.ndarray],
    num_pdf: int,
    comps: int,
    phones: Tuple[str, ...],
    states_per_phone: int,
    rng: np.random.Generator,
) -> MonoAligner:
    """M-step over aligned frames.

    Frame grouping is one corpus-wide stable argsort by pdf id (plus
    bincounts for the transition stats) — O(N log N) total, never
    O(num_pdf x N), which matters at tied-senone scale (4k pdfs)."""
    d = next(iter(features.values())).shape[1]
    means = np.zeros((num_pdf, comps, d), np.float32)
    vars_ = np.ones((num_pdf, comps, d), np.float32)
    mix_w = np.full((num_pdf, comps), np.log(1.0 / comps), np.float32)
    loops = np.full(num_pdf, 0.0)
    counts = np.zeros(num_pdf)
    self_counts = np.zeros(num_pdf)
    adv_counts = np.zeros(num_pdf)
    utt_ids = [u for u in alignments if u in features]
    all_f = np.concatenate([features[u] for u in utt_ids])
    all_a = np.concatenate([alignments[u] for u in utt_ids]).astype(np.int64)
    order = np.argsort(all_a, kind="stable")
    sorted_f = all_f[order]
    bounds = np.searchsorted(all_a[order], np.arange(num_pdf + 1))
    for u in utt_ids:
        ali = np.asarray(alignments[u], np.int64)
        same = ali[1:] == ali[:-1]
        self_counts += np.bincount(ali[:-1][same], minlength=num_pdf)
        adv_counts += np.bincount(ali[:-1][~same], minlength=num_pdf)
    global_mean = np.mean(all_f, axis=0)
    global_var = np.var(all_f, axis=0) + 1e-3
    for p in range(num_pdf):
        x = sorted_f[bounds[p] : bounds[p + 1]]
        if len(x):
            counts[p] = len(x)
            if comps == 1 or len(x) < comps * 4:
                means[p, :] = x.mean(axis=0)
                v = x.var(axis=0) + 1e-3 if len(x) > 3 else global_var
                vars_[p, :] = np.maximum(v, 1e-3)
            else:
                # k-means-lite: random frame seeds + one assignment pass
                seeds = x[rng.choice(len(x), comps, replace=False)]
                d2 = ((x[:, None, :] - seeds[None]) ** 2).sum(-1)
                a = d2.argmin(1)
                for ci in range(comps):
                    xc = x[a == ci]
                    if len(xc) > 3:
                        means[p, ci] = xc.mean(axis=0)
                        vars_[p, ci] = np.maximum(xc.var(axis=0), 1e-3)
                        mix_w[p, ci] = np.log(max(len(xc) / len(x), 1e-3))
                    else:
                        means[p, ci] = x.mean(axis=0)
                        vars_[p, ci] = np.maximum(x.var(axis=0), 1e-3)
                mix_w[p] -= np.log(np.exp(mix_w[p]).sum())
        else:
            means[p, :] = global_mean
            vars_[p, :] = global_var
        tot = self_counts[p] + adv_counts[p]
        loop_p = self_counts[p] / tot if tot else 0.5
        loops[p] = np.log(np.clip(loop_p, 0.05, 0.95))
    return MonoAligner(
        jnp.asarray(means),
        jnp.asarray(vars_),
        jnp.asarray(mix_w),
        jnp.asarray(loops, jnp.float32),
        phones,
        states_per_phone,
    )


def train_mono_aligner(
    features: Mapping[str, np.ndarray],
    transcripts: Mapping[str, Sequence[str]],
    lexicon: Lexicon,
    num_iters: int = 4,
    states_per_phone: int = 3,
    comps_per_state: int = 2,
    seed: int = 0,
    batched: bool = True,
    log=None,
) -> MonoAligner:
    """Flat-start + Viterbi-EM monophone training (train_mono.sh analog).

    ``batched`` runs each EM re-alignment through the bucketed batched
    Viterbi (a handful of XLA programs for the whole corpus instead of
    one per utterance shape)."""
    import time as _time

    rng = np.random.default_rng(seed)
    cache = _GraphCache(lexicon, states_per_phone)
    num_pdf = len(lexicon.phones) * states_per_phone
    # flat start
    alignments = {
        u: _flat_start_alignment(cache.get(transcripts[u]), features[u].shape[0])
        for u in features
        if u in transcripts
    }
    aligner = _estimate_from_alignment(
        features, alignments, num_pdf, 1, lexicon.phones, states_per_phone, rng
    )
    aligned = {u: features[u] for u in alignments}
    for it in range(num_iters):
        t0 = _time.time()
        comps = 1 if it < num_iters // 2 else comps_per_state
        alignments = align_corpus(
            aligner, aligned, transcripts, lexicon, batched=batched
        )
        aligner = _estimate_from_alignment(
            features, alignments, num_pdf, comps, lexicon.phones, states_per_phone, rng
        )
        if log:
            log(f"[mono] EM iter {it + 1}/{num_iters} "
                f"({comps} comp/state, {_time.time() - t0:.0f}s)")
    return aligner


def align_corpus(
    aligner: MonoAligner,
    features: Mapping[str, np.ndarray],
    transcripts: Mapping[str, Sequence[str]],
    lexicon: Lexicon,
    batched: bool = False,
    batch_size: int = 32,
    use_pallas: Optional[bool] = None,
) -> Dict[str, np.ndarray]:
    """Forced alignment for every utterance -> {utt: (T,) pdf ids}.

    ``batched=True`` buckets utterances and runs the batched Viterbi —
    the Pallas kernel on TPU (use_pallas=None autodetects), the
    vectorized scan elsewhere — for corpus-scale throughput."""
    cache = _GraphCache(lexicon, aligner.states_per_phone)
    if not batched:
        return {
            u: align_utterance(aligner, cache.get(transcripts[u]), features[u])
            for u in features
            if u in transcripts
        }
    return _align_corpus_batched(
        aligner, features, transcripts, cache, batch_size, use_pallas
    )


def _utt_tables(aligner: MonoAligner, graph: UttGraph, s_pad: int):
    """(pdf, preds, trans (3, S)) padded tables for the batched path."""
    pdf = np.zeros(s_pad, np.int32)
    pdf[: graph.num_states] = graph.pdf
    preds = np.full((s_pad, 3), -1, np.int32)
    preds[: graph.num_states] = graph.preds
    loop = np.asarray(aligner.loop_logp)
    trans = np.full((3, s_pad), _NEG, np.float32)
    for s in range(graph.num_states):
        for j, p in enumerate(graph.preds[s]):
            if p < 0:
                continue
            if p == s:
                trans[0, s] = loop[graph.pdf[s]]
            else:
                lp = loop[graph.pdf[p]]
                trans[j, s] = float(np.log1p(-np.exp(min(lp, -1e-4))))
    return pdf, preds, trans


def align_graphs(
    aligner: MonoAligner,
    graphs: Mapping[str, UttGraph],
    features: Mapping[str, np.ndarray],
    batch_size: int = 32,
    use_pallas: Optional[bool] = None,
    return_states: bool = False,
) -> Dict[str, np.ndarray]:
    """Batched forced alignment over arbitrary per-utterance graphs.

    The graph-based core of the s5-analog stage: monophone graphs and
    tied-senone context graphs (`align.tied.context_graph`) share this
    path — only the pdf tables differ.  Buckets utterances by padded
    (T, S) so a handful of XLA programs cover the corpus; runs the Pallas
    Viterbi on TPU, the vectorized scan elsewhere."""
    from .viterbi_pallas import viterbi_batch

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    skip = aligner.states_per_phone + 1
    items = [(u, graphs[u], features[u].shape[0]) for u in features if u in graphs]
    # bucket by padded (T, S) so programs are reused
    items.sort(key=lambda x: (x[2], x[1].num_states))
    out: Dict[str, np.ndarray] = {}
    states_out: Dict[str, np.ndarray] = {}
    for i0 in range(0, len(items), batch_size):
        group = items[i0 : i0 + batch_size]
        t_pad = _bucket_len(max(x[2] for x in group))
        s_pad = _round_up(max(x[1].num_states for x in group), 128)
        b = len(group)
        # one batched emission GEMM per group (per-utterance dispatches
        # are round-trip-bound on remote devices); GMM params ride as
        # jit ARGUMENTS so EM iterations share compiled programs
        d = features[group[0][0]].shape[1]
        feats_p = np.zeros((b, t_pad, d), np.float32)
        for j, (u, _, t_len) in enumerate(group):
            feats_p[j, :t_len] = features[u]
        e_all = np.asarray(_emissions_batch(
            aligner.means, aligner.vars, aligner.mix_w, jnp.asarray(feats_p)
        ))  # (b, t_pad, P)
        emit = np.full((b, t_pad, s_pad), _NEG, np.float32)
        tlen = np.zeros(b, np.int32)
        trans = np.zeros((b, 3, s_pad), np.float32)
        tables = []
        for j, (u, g, t_len) in enumerate(group):
            pdf, preds, tr = _utt_tables(aligner, g, s_pad)
            emit[j, :t_len] = e_all[j, :t_len][:, pdf]
            tlen[j] = t_len
            trans[j] = tr
            tables.append((pdf, preds, g))
        fn = viterbi_batch if use_pallas else _viterbi_reference_jit()
        bps, delta = fn(
            jnp.asarray(emit), jnp.asarray(tlen), jnp.asarray(trans), skip
        )
        bps = np.asarray(bps)
        delta = np.asarray(delta)
        for j, (u, g, t_len) in enumerate(group):
            pdf, preds, graph = tables[j]
            final = int(graph.final_states[0])
            if delta[j, final] < _NEG / 2:
                raise ValueError(
                    f"unalignable utterance {u}: {t_len} frames for "
                    f"{graph.num_states} states"
                )
            states = _backtrace(bps[j], preds, final, t_len)
            out[u] = pdf[states]
            if return_states:
                states_out[u] = states
    if return_states:
        return out, states_out
    return out


def _align_corpus_batched(
    aligner, features, transcripts, cache, batch_size, use_pallas
) -> Dict[str, np.ndarray]:
    graphs = {u: cache.get(transcripts[u]) for u in features if u in transcripts}
    return align_graphs(aligner, graphs, features, batch_size, use_pallas)
