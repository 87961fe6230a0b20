"""Egs-accounting semantics (allocate_egs_new.py:252-268 /
get_egs_xvec.sh:126-143): per-speaker draw counts are pinned over epochs
and the multitask stream ratio is data-driven."""

import numpy as np
import pytest

from sepi_tpu.config import ChunkConfig, TrainConfig
from sepi_tpu.data.manifest import Dataset, Utterance
from sepi_tpu.data.sampler import ChunkSampler, FrameSampler, MultitaskInterleaver


def _world(rng, num_spk=7, utts=3, frames=160, d=5):
    utt_list, feats = [], {}
    for s in range(num_spk):
        spk = f"s{s}"
        for i in range(utts):
            u = f"{spk}-u{i}"
            n = frames + 10 * i
            feats[u] = rng.normal(size=(n, d)).astype(np.float32)
            utt_list.append(Utterance(utt_id=u, spk_id=spk, wav=u))
    return Dataset(utt_list, "w"), feats


def test_chunk_sampler_pins_per_speaker_draws(rng):
    """The num_repeats accounting: over any whole number of passes every
    eligible speaker is drawn exactly the same number of times (the
    archive composition of allocate_egs_new.py — not multinomial)."""
    ds, feats = _world(rng, num_spk=7)
    cfg = ChunkConfig(min_chunk_len=50, max_chunk_len=50, num_buckets=1)
    sampler = ChunkSampler(feats, ds, cfg, batch_size=14, seed=5)
    for _ in range(21):  # 21 batches x 14 = 294 draws = 42 full passes of 7
        sampler.sample_batch(50)
    counts = list(sampler.draw_counts.values())
    assert len(set(counts)) == 1 and counts[0] == 42


def test_chunk_sampler_balance_within_one_of_even(rng):
    """Mid-pass, draw counts never differ by more than one."""
    ds, feats = _world(rng, num_spk=5)
    cfg = ChunkConfig(min_chunk_len=40, max_chunk_len=40, num_buckets=1)
    sampler = ChunkSampler(feats, ds, cfg, batch_size=8, seed=1)
    for _ in range(9):
        sampler.sample_batch(40)
        counts = list(sampler.draw_counts.values())
        assert max(counts) - min(counts) <= 1


def test_chunk_sampler_skips_short_speakers_consistently(rng):
    """Speakers with no long-enough utterance are skipped (the _new fix),
    and the remaining ones stay exactly balanced."""
    ds, feats = _world(rng, num_spk=6, frames=100)
    # make one speaker too short for the long bucket
    for u in list(feats):
        if u.startswith("s0"):
            feats[u] = feats[u][:30]
    cfg = ChunkConfig(min_chunk_len=80, max_chunk_len=80, num_buckets=1)
    sampler = ChunkSampler(feats, ds, cfg, batch_size=10, seed=2)
    for _ in range(5):
        sampler.sample_batch(80)
    assert sampler.draw_counts[sampler.label_map["s0"]] == 0
    others = [c for lab, c in sampler.draw_counts.items()
              if lab != sampler.label_map["s0"]]
    assert max(others) == 10 and min(others) == 10


def test_multitask_ratio_is_data_driven(rng):
    """With explicit repeats_per_spk the am:xvec batch split follows the
    reference accounting (am egs = frames/frames_per_eg; xvec egs =
    repeats x speakers)."""
    from sepi_tpu.recipes.phonetic import _multitask_iter

    ds, feats = _world(rng, num_spk=4, utts=2, frames=300)
    ali = {u: rng.integers(0, 8, size=f.shape[0]).astype(np.int32)
           for u, f in feats.items()}
    cfg = TrainConfig(
        chunks=ChunkConfig(min_chunk_len=40, max_chunk_len=40, num_buckets=1),
        batch_size=8, am_batch_size=16, repeats_per_spk=50,
    )
    num_steps = 120
    _, _, inter = _multitask_iter(feats, ali, ds, cfg, (2, 2), num_steps)
    total_frames = sum(f.shape[0] for f in feats.values())
    am_epoch = -(-(total_frames // 8) // 16)
    xv_epoch = -(-(50 * 4) // 8)
    expect_am = round(num_steps * am_epoch / (am_epoch + xv_epoch))
    assert abs((inter.num_am - 1) - expect_am) <= 1
    # the interleaver exhausts both streams together over the budget
    tasks = [b.task for b, _ in inter]
    assert tasks.count("am") == inter.num_am
    assert tasks.count("xvec") == inter.num_xvec


def test_multitask_ratio_balances_by_default(rng):
    from sepi_tpu.recipes.phonetic import _multitask_iter

    ds, feats = _world(rng, num_spk=4, utts=2, frames=300)
    ali = {u: rng.integers(0, 8, size=f.shape[0]).astype(np.int32)
           for u, f in feats.items()}
    cfg = TrainConfig(
        chunks=ChunkConfig(min_chunk_len=40, max_chunk_len=40, num_buckets=1),
        batch_size=8, am_batch_size=16,
    )
    _, _, inter = _multitask_iter(feats, ali, ds, cfg, (2, 2), 100)
    assert abs(inter.num_am - inter.num_xvec) <= 1


def test_chunk_sampler_block_runs(rng):
    """block_size=K: iteration emits runs of K batches sharing one chunk
    length (the per-archive-constant-length structure superstep dispatch
    stacks), and speaker balance is unaffected."""
    ds, feats = _world(rng, num_spk=6, frames=200)
    cfg = ChunkConfig(min_chunk_len=40, max_chunk_len=80, num_buckets=3)
    sampler = ChunkSampler(feats, ds, cfg, batch_size=6, seed=3, block_size=4)
    it = iter(sampler)
    lens = [next(it).chunk_len for _ in range(24)]
    for i in range(0, 24, 4):
        assert len(set(lens[i : i + 4])) == 1
    assert len(set(lens)) > 1  # different blocks do draw different buckets


def test_interleaver_blocks_preserve_accounting(rng):
    """block_size>1 keeps exhaust-together totals and emits same-task
    same-shape runs; expected stream ratio is unchanged."""
    ds, feats = _world(rng, num_spk=4, utts=2, frames=300)
    ali = {u: rng.integers(0, 8, size=f.shape[0]).astype(np.int32)
           for u, f in feats.items()}
    cfg = ChunkConfig(min_chunk_len=40, max_chunk_len=60, num_buckets=2)
    am = FrameSampler(feats, ali, chunk_len=8, batch_size=16, seed=1, context=(2, 2))
    xv = ChunkSampler(feats, ds, cfg, batch_size=8, seed=1)
    inter = MultitaskInterleaver(am, xv, num_am_batches=37, num_xvec_batches=23,
                                 am_weight=2.0, xvec_weight=0.5, seed=9,
                                 block_size=4)
    rows = [(b.task, b.feats.shape, w) for b, w in inter]
    tasks = [t for t, _, _ in rows]
    assert tasks.count("am") == 37 and tasks.count("xvec") == 23
    # weights ride along per task
    assert all(w == (2.0 if t == "am" else 0.5) for t, _, w in rows)
    # runs are same-task AND same-shape (xvec blocks share a bucket)
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j][0] == rows[i][0] and j - i < 4:
            assert rows[j][1] == rows[i][1]
            j += 1
        i = j


def test_prefetch_loader_close_stops_producer(rng):
    """PrefetchLoader over an infinite sampler: yields batches, close()
    terminates the producer thread (no daemon leak per training run)."""
    import time

    from sepi_tpu.data.featstore import PrefetchLoader

    ds, feats = _world(rng, num_spk=4, frames=120)
    cfg = ChunkConfig(min_chunk_len=40, max_chunk_len=40, num_buckets=1)
    sampler = ChunkSampler(feats, ds, cfg, batch_size=4, seed=7)
    loader = PrefetchLoader(iter(sampler), depth=2)
    got = [next(loader) for _ in range(5)]
    assert all(g.feats.shape == (4, 40, 5) for g in got)
    loader.close()
    deadline = time.time() + 3.0
    while loader._thread.is_alive() and time.time() < deadline:
        time.sleep(0.02)
    assert not loader._thread.is_alive()


def test_prefetch_loader_propagates_errors():
    from sepi_tpu.data.featstore import PrefetchLoader

    def bad():
        yield 1
        raise RuntimeError("producer boom")

    loader = PrefetchLoader(bad(), depth=2)
    assert next(loader) == 1
    with pytest.raises(RuntimeError, match="producer boom"):
        next(loader)
        next(loader)
