"""On-disk feature store + prefetching input pipeline.

The reference's egs pipeline materializes features and training examples
as Kaldi archives and streams them through `ark,bg:` background-prefetch
pipes into the trainer (`frame_level_objf/common.py:277-283`).  Here the
durable artifact is a memory-mapped feature store (one flat .npy of
frames + a json index), and prefetch is a background thread that keeps a
bounded queue of ready minibatches ahead of the accelerator — the
`ark,bg:` replacement that keeps the chip from ever waiting on sampling.

Usage::

    FeatStore.write("feats", features_dict)        # once, durable
    store = FeatStore.open("feats")                # mmap, zero-copy rows
    sampler = ChunkSampler(store, dataset, ...)    # Mapping interface
    for batch in PrefetchLoader(iter(sampler), depth=4): ...
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Dict, Iterable, Iterator, Mapping, Optional

import numpy as np


class FeatStore(Mapping):
    """Memory-mapped utt -> (T, D) feature table.

    Rows for one utterance are contiguous, so slicing a chunk out of an
    utterance touches only the pages it needs — sampling cost is
    independent of corpus size (the property the reference buys with its
    per-archive egs dumps, without the multi-TB duplication).
    """

    def __init__(self, data: np.ndarray, index: Dict[str, tuple]):
        self._data = data
        self._index = index

    @classmethod
    def write(cls, path_prefix: str, features: Mapping[str, np.ndarray]) -> "FeatStore":
        os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
        utts = sorted(features)
        dim = features[utts[0]].shape[1]
        total = sum(features[u].shape[0] for u in utts)
        arr = np.lib.format.open_memmap(
            path_prefix + ".npy", mode="w+", dtype=np.float32, shape=(total, dim)
        )
        index: Dict[str, tuple] = {}
        off = 0
        for u in utts:
            f = features[u]
            if f.shape[1] != dim:
                raise ValueError(f"{u}: dim {f.shape[1]} != {dim}")
            arr[off : off + f.shape[0]] = f
            index[u] = (off, f.shape[0])
            off += f.shape[0]
        arr.flush()
        with open(path_prefix + ".json", "w") as fh:
            json.dump({"dim": dim, "index": index}, fh)
        return cls.open(path_prefix)

    @classmethod
    def open(cls, path_prefix: str) -> "FeatStore":
        with open(path_prefix + ".json") as fh:
            meta = json.load(fh)
        data = np.load(path_prefix + ".npy", mmap_mode="r")
        return cls(data, {k: tuple(v) for k, v in meta["index"].items()})

    # -- Mapping interface (works anywhere a features dict is accepted) --
    def __getitem__(self, utt: str) -> np.ndarray:
        off, n = self._index[utt]
        return self._data[off : off + n]

    def __iter__(self):
        return iter(self._index)

    def __len__(self):
        return len(self._index)

    def __contains__(self, utt):
        return utt in self._index


class PrefetchLoader:
    """Background-thread minibatch prefetch (the ark,bg: replacement).

    Wraps any batch iterator; a daemon thread keeps up to ``depth``
    batches ready.  Exceptions in the producer propagate to the consumer
    on the next __next__ (matching the reference's
    background_command(require_zero_status=True) failure semantics)."""

    _DONE = object()

    def __init__(self, it: Iterable, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = False
        self._thread = threading.Thread(target=self._run, args=(iter(it),), daemon=True)
        self._thread.start()

    def _run(self, it: Iterator):
        try:
            for item in it:
                while not self._stop:
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop:
                    return
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            if not self._stop:
                self._q.put(self._DONE)

    def close(self) -> None:
        """Stop the producer thread (infinite samplers would otherwise
        keep a blocked daemon thread alive per training run).

        Joins until the producer actually exits: callers reuse the
        wrapped sampler right after close() (e.g. calibration draws),
        and the samplers' RNG/rotation state is not thread-safe, so
        returning with the thread alive would race.  The producer
        observes ``_stop`` at its next put attempt (0.2 s poll), so the
        wait is bounded by one iterator step."""
        self._stop = True
        try:  # unblock a producer waiting on a full queue
            self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
