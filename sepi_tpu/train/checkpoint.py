"""Checkpointing and checkpoint-tail combination.

Replaces the reference's `{iter}.raw` model files + `nnet3-combine`
(SURVEY.md §5 "Checkpoint / resume"): models checkpointed every
iteration, every 10th preserved (`--cleanup.preserve-model-interval=10`),
final model = combination over the checkpoint tail maximizing a held-out
objective (`frame_level_objf/common.py:864-1055`), with models fed in
reversed order so the freshest batch-norm stats win (`:1003-1008`).

Format: flax msgpack of the full TrainState pytree — single-file,
host-side, deterministic.  (Orbax would add async/multi-host sharded
checkpointing; for 5-10M-param models a blocking single-file write is
microseconds of training time and far easier to reason about.  Swap-in
point documented here if model sizes ever grow.)
"""

from __future__ import annotations

import os
import re
from typing import Callable, List, Optional

import flax.serialization
import jax


def save_checkpoint(state, directory: str, step: int, keep_every: int = 10, max_keep: int = 25) -> str:
    """Write `ckpt_{step}.msgpack`; prune old ones except every ``keep_every``-th."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step}.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state)))
    # cleanup (remove_model semantics, train_cvector_dnn.py:327-333)
    steps = sorted(_list_steps(directory))
    recent = set(steps[-max_keep:])
    for s in steps:
        if s not in recent and (keep_every == 0 or s % keep_every != 0):
            os.remove(os.path.join(directory, f"ckpt_{s}.msgpack"))
    return path


def _list_steps(directory: str) -> List[int]:
    out = []
    if not os.path.isdir(directory):
        return out  # fresh run: no checkpoint dir yet
    for name in os.listdir(directory):
        m = re.fullmatch(r"ckpt_(\d+)\.msgpack", name)
        if m:
            out.append(int(m.group(1)))
    return out


def latest_checkpoint(directory: str) -> Optional[int]:
    steps = _list_steps(directory)
    return max(steps) if steps else None


def load_checkpoint(template, directory: str, step: Optional[int] = None):
    """Restore into the structure of ``template`` (a TrainState)."""
    if step is None:
        step = latest_checkpoint(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"ckpt_{step}.msgpack")
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def combine_checkpoints(
    template,
    directory: str,
    objf_fn: Callable,
    num_tail: int = 10,
):
    """nnet3-combine analog: among uniform averages of the last K
    checkpoints (K = 1..num_tail, freshest first so the newest BN stats
    win), pick the one with the best held-out objective.

    ``objf_fn(state) -> float`` evaluates a candidate (typically the
    valid-diagnostic objective).  This is the convex-combination search
    of nnet3-combine reduced to the prefix-average family, which is what
    the reference's combination converges to in practice.
    """
    steps = sorted(_list_steps(directory))[-num_tail:]
    if not steps:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    states = [load_checkpoint(template, directory, s) for s in reversed(steps)]
    best_state, best_objf = states[0], objf_fn(states[0])
    # running prefix average of params (+ freshest batch_stats kept)
    avg_params = states[0].params
    for k in range(1, len(states)):
        avg_params = jax.tree.map(
            lambda a, p, k=k: (a * k + p) / (k + 1), avg_params, states[k].params
        )
        cand = states[0].replace(params=avg_params)
        objf = objf_fn(cand)
        if objf > best_objf:
            best_state, best_objf = cand, objf
    return best_state, best_objf


def parameter_progress(old_params, new_params) -> dict:
    """nnet3-show-progress analog: per-component relative parameter
    change between two param pytrees (host copies, e.g. from
    `jax.device_get(state.params)` at checkpoint boundaries).

    The reference logs `||new - old|| / ||old||` per component each
    iteration (`compute_cvector_progress`,
    `frame_level_objf/common.py:841-855`; parsed by
    `report/log_parse.py:238`) as the learning-health diagnostic: a
    layer whose relative change collapses early has stopped learning, a
    layer whose change stays O(1) is thrashing.  Keys are the top-level
    param subtrees (the component names of the flax module tree).
    """
    import numpy as np

    out = {}
    for k in old_params:
        o = jax.tree.leaves(old_params[k])
        n = jax.tree.leaves(new_params[k])
        sq_o = sum(float(np.sum(np.square(np.asarray(a, np.float64)))) for a in o)
        sq_d = sum(
            float(np.sum(np.square(np.asarray(b, np.float64) - np.asarray(a, np.float64))))
            for a, b in zip(o, n)
        )
        out[k] = float(np.sqrt(sq_d) / max(np.sqrt(sq_o), 1e-20))
    return out
