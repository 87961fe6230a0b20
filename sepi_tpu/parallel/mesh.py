"""Device mesh + sharding rules — the distributed runtime.

Replaces the reference's entire "distributed backend" (SURVEY.md §2.5):
run.pl process fan-out + filesystem IPC + periodic model averaging become
a `jax.sharding.Mesh` with GSPMD-partitioned jitted programs — gradients
are reduced over ICI by compiler-inserted collectives every step
(synchronous DP, strictly stronger than the reference's local-SGD
averaging, §2.4).

Mesh layout: ('data', 'model').  The TDNNs here are 5-10M params, so
model_parallel_size=1 everywhere and the model axis exists for API
completeness / future growth (documented decision per SURVEY.md §2.4:
tensor/pipeline parallelism deliberately not needed).  Batches shard over
'data'; params/opt-state replicate.

Multi-host: `jax.distributed.initialize()` + per-host dataset sharding
(`host_shard_dataset`) over DCN, compute collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel_size: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel_size:
        raise ValueError(f"{n} devices not divisible by model={model_parallel_size}")
    arr = np.array(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; rest replicated."""
    return NamedSharding(mesh, P("data"))


def superbatch_sharded(mesh: Mesh) -> NamedSharding:
    """Stacked-step batches (K, B, ...): scan axis replicated, batch
    axis sharded over 'data' (the superstep layout)."""
    return NamedSharding(mesh, P(None, "data"))


def host_shard_dataset(dataset, host_index: Optional[int] = None, host_count: Optional[int] = None):
    """Shard a manifest across hosts (split_data.sh over DCN analog)."""
    if host_index is None:
        host_index = jax.process_index()
    if host_count is None:
        host_count = jax.process_count()
    return dataset.split(host_count)[host_index]
