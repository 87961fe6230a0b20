"""Multi-host initialization and data distribution.

Replaces the reference's cluster layer (`utils/run.pl` / `queue.pl` /
`slurm.pl` + shared-filesystem IPC, SURVEY.md §1 L0, §2.5): each host
runs the SAME program; `jax.distributed.initialize` wires the hosts into
one runtime; arrays shard over all devices; collectives ride ICI.  Host
responsibilities are limited to feeding their local shard of the input
pipeline (`host_shard_dataset`) and writing checkpoints from process 0.

Single-host (or driver dryrun) use needs no initialization — every
helper degrades to the local device set.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host runtime (no-op if already initialized or
    single-host).  On TPU pods with standard env vars, bare
    ``initialize()`` autodetects everything.

    Ordering matters: `jax.distributed.initialize` must run before
    ANYTHING touches the local backend — `jax.devices()`,
    `jax.process_count()`, even an innocent array op — because backend
    initialization is irreversible and distributed init would then fail
    (the lesson recorded in `__graft_entry__.py` / commit 3223e46).  So
    no backend-probing pre-checks here; we ask the distributed client
    itself whether it is already up.

    Failure policy: an *explicit* multi-host request (coordinator
    address given, or num_processes > 1) must never silently degrade to
    disconnected single-host runs — errors propagate.  Only bare
    auto-detect ``initialize()`` falls back to local single-host.
    """
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return
    explicit = coordinator_address is not None or (num_processes or 0) > 1
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except Exception as e:
        if explicit:
            raise RuntimeError(
                "multi-host jax.distributed.initialize failed for an "
                f"explicit {num_processes}-process launch "
                f"(coordinator={coordinator_address!r}); refusing to "
                "degrade to a disconnected single-host run"
            ) from e
        # bare auto-detect on a single host: run local


def is_primary() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's row range of a globally-sharded batch."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def assemble_global_batch(local_arrays, mesh, spec=None):
    """Build a globally-sharded array from per-host local shards
    (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_arrays,
    )
