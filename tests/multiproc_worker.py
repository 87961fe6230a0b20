"""Worker for tests/test_multiprocess.py: one REAL jax process of N.

Launched as `python multiproc_worker.py <pid> <nproc> <port>` with
JAX_PLATFORMS=cpu and JAX_NUM_CPU_DEVICES set (the parent test clears
the sitecustomize preload so env vars take effect).  Exercises the
actual multi-host code paths — `jax.distributed.initialize` wiring,
cross-process device mesh, `assemble_global_batch`, the map-reduce EM
E-step, and a data-parallel training step whose gradient all-reduce
crosses the process boundary (Gloo CPU collectives) — and asserts each
matches the single-program computation.

This is the strongest multi-host evidence available without a real
multi-host TPU slice: 2 OS processes, disjoint local devices, all
communication through jax collectives (SURVEY.md §2.4 "embarrassing
map / host sharding"; replaces run.pl + filesystem IPC).
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from sepi_tpu.classical.gmm import DiagGmm, accumulate_stats, accumulate_stats_sharded
from sepi_tpu.config import OptimizerConfig
from sepi_tpu.models import XVector, XVectorConfig
from sepi_tpu.models.tdnn import TdnnSpec
from sepi_tpu.parallel.mesh import host_shard_dataset, make_mesh
from sepi_tpu.parallel.multihost import (
    assemble_global_batch,
    initialize,
    is_primary,
    local_batch_slice,
)
from sepi_tpu.train import build_optimizer, create_train_state
from sepi_tpu.train.trainer import make_xvec_step

initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid
assert len(jax.local_devices()) * nproc == len(jax.devices())

mesh = make_mesh()
rng = np.random.default_rng(0)  # same seed everywhere: shared global data

# --- global batch assembly + a cross-process reduction -------------------
full = rng.normal(size=(8, 16)).astype(np.float32)
garr = assemble_global_batch(full[local_batch_slice(8)], mesh)
got = np.asarray(jax.jit(jnp.mean)(garr))
np.testing.assert_allclose(got, full.mean(), rtol=1e-6)

# --- map-reduce EM: frames shard over BOTH processes' devices ------------
d, k, n = 4, 3, 64
frames = rng.normal(size=(n, d)).astype(np.float32)
gmm = DiagGmm(
    weights=jnp.full((k,), 1.0 / k),
    means=jnp.asarray(rng.normal(size=(k, d)).astype(np.float32)),
    vars=jnp.ones((k, d), jnp.float32),
)
stats = accumulate_stats_sharded(gmm, jnp.asarray(frames), mesh)
ref = accumulate_stats(gmm, jnp.asarray(frames))
for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(ref)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4)

# --- data-parallel train step: gradient psum crosses processes -----------
cfg = XVectorConfig(
    feat_dim=8,
    num_speakers=4,
    frame_specs=(TdnnSpec(16, (-2, -1, 0, 1, 2)), TdnnSpec(32, (0,))),
    embed_dim=16,
)
model = XVector(cfg)
# reference-semantics chain: the sharded-vs-replicated parity assertions
# below need the linear momentum update (the default muon preconditioner
# amplifies reassociation roundoff by design)
tx, _ = build_optimizer(OptimizerConfig(preconditioner="none"), 100)
feats = rng.normal(size=(8, 20, 8)).astype(np.float32)
labels = (np.arange(8) % 4).astype(np.int32)

state = create_train_state(model, tx, jax.random.PRNGKey(0), jnp.asarray(feats[:2]))
sharded_step = make_xvec_step(model, tx, mesh=mesh)
gfeats = assemble_global_batch(feats[local_batch_slice(8)], mesh)
glabels = assemble_global_batch(labels[local_batch_slice(8)], mesh)
new_state, metrics = sharded_step(state, gfeats, glabels, 1.0)

# reference: same step, same global batch, replicated single-program jit
state2 = create_train_state(model, tx, jax.random.PRNGKey(0), jnp.asarray(feats[:2]))
ref_state, ref_metrics = make_xvec_step(model, tx)(
    state2, jnp.asarray(feats), jnp.asarray(labels), 1.0
)
np.testing.assert_allclose(
    np.asarray(metrics["objf"]), np.asarray(ref_metrics["objf"]), rtol=1e-5
)
for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

# --- Trainer: superstep dispatch + device staging across processes -------
# Each process feeds its host shard of every batch; the Trainer's staging
# assembles global arrays (make_array_from_process_local_data) and the
# scanned superstep's gradient psum crosses the process boundary.
from sepi_tpu.data.sampler import ChunkBatch
from sepi_tpu.train import Trainer, make_superstep

seq = [
    (rng.normal(size=(8, 20, 8)).astype(np.float32),
     (np.arange(8) % 4).astype(np.int32))
    for _ in range(12)
]
state3 = create_train_state(model, tx, jax.random.PRNGKey(0), jnp.asarray(feats[:2]))
tr = Trainer(
    steps={"xvec": make_xvec_step(model, tx, mesh=mesh)},
    state=state3, log_every=10**9,
    supersteps={"xvec": make_superstep(model, tx, mesh=mesh)},
    steps_per_dispatch=4, mesh=mesh,
)
sl = local_batch_slice(8)
tr.run(iter([ChunkBatch(f[sl], l[sl], 20, "xvec") for f, l in seq]), num_steps=12)

# reference: the same 12 steps as single-program supersteps on the
# global batches
state4 = create_train_state(model, tx, jax.random.PRNGKey(0), jnp.asarray(feats[:2]))
sstep1 = make_superstep(model, tx)
for i in range(0, 12, 4):
    fs = np.stack([seq[j][0] for j in range(i, i + 4)])
    ls = np.stack([seq[j][1] for j in range(i, i + 4)])
    state4, _ = sstep1(state4, fs, ls, np.ones(4, np.float32))
assert int(np.asarray(tr.state.step)) == 12
for a, b in zip(jax.tree.leaves(tr.state.params), jax.tree.leaves(state4.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

# --- host-level dataset sharding stays disjoint + exhaustive -------------
from sepi_tpu.data.manifest import Dataset, Utterance

ds = Dataset(
    [Utterance(utt_id=f"u{i:02d}", spk_id=f"s{i % 3}", wav=f"{i}.wav")
     for i in range(10)]
)
mine = host_shard_dataset(ds)
# verify disjoint cover by exchanging per-host counts through a collective:
# each of this host's local devices carries the host's utterance count.
nloc = len(jax.local_devices())
gcount = assemble_global_batch(np.full((nloc,), len(mine), np.int32), mesh)
total = int(np.asarray(jax.jit(jnp.sum)(gcount))) // nloc
assert total == len(ds), (total, len(ds))

print(f"proc {pid}: PASS (primary={is_primary()})", flush=True)
