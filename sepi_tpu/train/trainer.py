"""Training loop: single-task and multitask (c-vector) trainers.

Replaces `steps/nnet3/train_raw_dnn_new.py` (490 LoC) and the custom
`steps/nnet3/train_cvector_dnn.py` (417 LoC) + their shared library
(`frame_level_objf/common.py`).  The reference's outer loop forks 2-8 GPU
jobs per iteration and averages models through the filesystem; here one
jitted train step is synchronous-data-parallel over the device mesh
(parallel/dp.py), which is strictly stronger than model averaging
(SURVEY.md §2.4), so the "iteration" structure collapses to plain steps.

What is preserved semantically:
- objective: per-example mean log-prob, reported like nnet3-train logs
  (parsed by `get_successful_models`, `train/common.py:107-110`),
- multitask: per-step *single-task* minibatches with weighted losses,
  interleaved am/xvec streams (`nnet3-copy-cvector-egs` semantics via
  data.sampler.MultitaskInterleaver),
- diagnostics: held-out valid/train-subset objective computed
  periodically (`compute_cvector_train_cv_probabilities`),
- checkpoint tail combination (checkpoint.py, `nnet3-combine` analog).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax



class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_feats: np.ndarray,
    model_kwargs: Optional[Dict] = None,
) -> TrainState:
    variables = model.init(rng, jnp.asarray(sample_feats), train=False, **(model_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def _softmax_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def _apply(model, params, batch_stats, feats, train, **kw):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mut = model.apply(
            variables, feats, train=True, mutable=["batch_stats"], **kw
        )
        # models without batch-norm (e.g. the nnet2 p-norm net) mutate nothing
        return out, mut.get("batch_stats", batch_stats)
    return model.apply(variables, feats, train=False, **kw), batch_stats


# ------------------------------------------------------------ step factories


def _jit_step(fn, mesh):
    """jit a step; with a mesh, annotate GSPMD shardings: state/opt
    replicated, batch axis sharded over 'data' — XLA inserts the gradient
    all-reduce over ICI (the psum that replaces nnet3-average)."""
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    from ..parallel.mesh import batch_sharded, replicated

    rep, sh = replicated(mesh), batch_sharded(mesh)
    return jax.jit(
        fn,
        donate_argnums=(0,),
        in_shardings=(rep, sh, sh, rep),
        out_shardings=(rep, rep),
    )


def make_xvec_step(model, tx, task_kwargs: Optional[Dict] = None, mesh=None):
    """Speaker-chunk CE step.  Returns jitted (state, feats, labels, weight)."""
    kw = dict(task_kwargs or {})

    def step(state: TrainState, feats, labels, weight=1.0):
        def loss_fn(params):
            out, new_stats = _apply(model, params, state.batch_stats, feats, True, **kw)
            xent = _softmax_xent(out["logits"], labels)
            loss = weight * jnp.mean(xent)
            acc = jnp.mean(jnp.argmax(out["logits"], -1) == labels)
            return loss, (new_stats, -jnp.mean(xent), acc)

        grads, (new_stats, objf, acc) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, new_stats, opt_state)
        return new_state, {"objf": objf, "accuracy": acc, "grad_norm": optax.global_norm(grads)}

    return _jit_step(step, mesh)


def make_am_step(model, tx, task_kwargs: Optional[Dict] = None, mesh=None):
    """Per-frame senone CE step; labels (B, L) aligned to the logits'
    central frames (the sampler provides the model's context margin)."""
    kw = dict(task_kwargs or {})

    def step(state: TrainState, feats, labels, weight=1.0):
        def loss_fn(params):
            out, new_stats = _apply(model, params, state.batch_stats, feats, True, **kw)
            logits = out["logits"] if "logits" in out else out["am_logits"]
            xent = _softmax_xent(logits, labels)
            loss = weight * jnp.mean(xent)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return loss, (new_stats, -jnp.mean(xent), acc)

        grads, (new_stats, objf, acc) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, new_stats, opt_state)
        return new_state, {"objf": objf, "accuracy": acc, "grad_norm": optax.global_norm(grads)}

    return _jit_step(step, mesh)


def make_eval_step(model, task_kwargs: Optional[Dict] = None, frame_level: bool = False):
    kw = dict(task_kwargs or {})

    @jax.jit
    def step(state: TrainState, feats, labels):
        out, _ = _apply(model, state.params, state.batch_stats, feats, False, **kw)
        logits = out["logits"] if "logits" in out else out["am_logits"]
        xent = _softmax_xent(logits, labels)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return {"objf": -jnp.mean(xent), "accuracy": acc}

    return step


def finalize_batch_stats(model, state: TrainState, batches, model_kwargs=None) -> TrainState:
    """Kaldi-style exact inference statistics for batch-norm.

    Kaldi's BatchNormComponent accumulates *exact* dataset statistics for
    test mode rather than an EMA; the EMA's residual init bias measurably
    distorts deep-stack inference after short trainings.  This pass
    re-derives the stats from calibration batches: a momentum-0 twin of
    the model emits each batch's (mean, var); raw moments are pooled
    across batches (E[x], E[x^2], so across-batch mean spread is counted)
    and written back as the inference stats.
    """
    calib = model.clone(bn_momentum=0.0)
    kw = dict(model_kwargs or {})

    @jax.jit
    def batch_moments(params, batch_stats, feats):
        _, mut = calib.apply(
            {"params": params, "batch_stats": batch_stats},
            feats,
            train=True,
            mutable=["batch_stats"],
            **kw,
        )
        return mut["batch_stats"]

    sum_m = None
    sum_x2 = None
    n = 0
    for feats in batches:
        stats = batch_moments(state.params, state.batch_stats, jnp.asarray(feats))
        means = jax.tree.map(lambda s: s["mean"], stats, is_leaf=lambda s: isinstance(s, dict) and "mean" in s)
        x2 = jax.tree.map(
            lambda s: s["var"] + s["mean"] ** 2,
            stats,
            is_leaf=lambda s: isinstance(s, dict) and "mean" in s,
        )
        if sum_m is None:
            sum_m, sum_x2 = means, x2
        else:
            sum_m = jax.tree.map(jnp.add, sum_m, means)
            sum_x2 = jax.tree.map(jnp.add, sum_x2, x2)
        n += 1
    if n == 0:
        raise ValueError("finalize_batch_stats: no calibration batches")
    mean = jax.tree.map(lambda a: a / n, sum_m)
    var = jax.tree.map(lambda a, m: jnp.maximum(a / n - m * m, 0.0), sum_x2, mean)
    new_stats = jax.tree.map(
        lambda s, m, v: {**s, "mean": m, "var": v},
        state.batch_stats,
        mean,
        var,
        is_leaf=lambda s: isinstance(s, dict) and "mean" in s,
    )
    return state.replace(batch_stats=new_stats)


# convenience aliases used by __init__
xvec_train_step = make_xvec_step
am_train_step = make_am_step
xvec_eval_step = partial(make_eval_step, frame_level=False)
am_eval_step = partial(make_eval_step, frame_level=True)


# ------------------------------------------------------------------ Trainer


@dataclasses.dataclass
class Trainer:
    """Outer loop: batches from an iterator, periodic diagnostics.

    ``batch_iter`` yields either ChunkBatch/FrameBatch objects or
    (batch, weight) pairs (MultitaskInterleaver).  Steps are dispatched
    on ``batch.task``: per-step single-task minibatches exactly like the
    interleaved-egs pipeline.

    Diagnostics mirror the reference's per-iteration machinery:
    - held-out objectives (`compute_{train,cv}_probabilities` /
      `nnet3-compute-prob`): supply ``valid_batches`` + ``eval_steps``
      and both are scored every ``eval_every`` steps (logged as
      'valid:<task>'),
    - divergence guard (`get_successful_models`,
      `train/common.py:103-137`): a non-finite training objective
      aborts with the last good step identified, instead of silently
      averaging garbage like a diverged job would.
    """

    steps: Dict[str, Callable]  # task -> jitted train step
    state: TrainState
    log_every: int = 50
    logger: Optional[Callable[[int, str, Dict[str, float]], None]] = None
    history: list = dataclasses.field(default_factory=list)
    valid_batches: Optional[list] = None  # list of ChunkBatch/FrameBatch
    eval_steps: Optional[Dict[str, Callable]] = None  # task -> eval step
    eval_every: int = 200

    def _run_valid(self, n: int):
        if not self.valid_batches or not self.eval_steps:
            return
        for vb in self.valid_batches:
            ev = self.eval_steps.get(vb.task)
            if ev is None:
                continue
            m = {k: float(v) for k, v in ev(self.state, vb.feats, vb.labels).items()}
            self.history.append((n, f"valid:{vb.task}", m))
            if self.logger:
                self.logger(n, f"valid:{vb.task}", m)

    def run(self, batch_iter: Iterable, num_steps: Optional[int] = None) -> TrainState:
        n = 0
        for item in batch_iter:
            if isinstance(item, tuple):
                batch, weight = item
            else:
                batch, weight = item, 1.0
            step_fn = self.steps[batch.task]
            self.state, metrics = step_fn(
                self.state, batch.feats, batch.labels,
                jnp.asarray(weight, jnp.float32),
            )
            n += 1
            last = num_steps is not None and n >= num_steps
            if n % self.log_every == 0 or last:
                m = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(m.get("objf", 0.0)):
                    raise RuntimeError(
                        f"training diverged: non-finite objective at step {n} "
                        f"(task {batch.task}); last good metrics: "
                        f"{self.history[-1] if self.history else None}"
                    )
                self.history.append((n, batch.task, m))
                if self.logger:
                    self.logger(n, batch.task, m)
            if n % self.eval_every == 0 or last:
                self._run_valid(n)
            if last:
                break
        return self.state
