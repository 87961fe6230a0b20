"""Optimizer chain reproducing the nnet3-train update semantics.

Replaces `nnet3-train`'s SGD machinery (SURVEY.md §2.2 "nnet3") with an
optax chain:

- momentum SGD (momentum 0.5, `run_xvector_new.sh:130-150`),
- **max-param-change**: the global-l2 cap Kaldi applies to the scaled
  update per minibatch (`--max-param-change=2`) — here a global-norm
  clip on the post-LR update,
- exponential effective-LR decay from initial to final over training
  (`steps/libs/nnet3/train/common.py:644-657`).  The reference
  multiplies the LR by num_jobs because its parallelism is model
  averaging (local SGD); with synchronous gradient psum the same factor
  appears as `num_jobs_multiplier` so global-batch/LR semantics match,
- **proportional shrinkage**: params *= (1 - shrink·lr) once per outer
  iteration (`train_cvector_dnn.py:285-296`, guard shrink-factor > 0.5),
  a BN-friendly weight decay variant, spread smoothly over per-minibatch
  steps via OptimizerConfig.shrink_iterations (see proportional_shrink),
- per-subtree LR factors for grafted AM parts
  (`nnet3-copy --edits=set-learning-rate-factor ... 0.2/0.1`,
  `train_xvector_with_am.sh:63-65`) via an update-scaling mask.

Deliberate deviation (documented for parity review): Kaldi's online
natural-gradient preconditioner (NG-SGD) is not reproduced exactly;
synchronous DP with exact gradients + momentum reaches the same
objective on these 5-10M-param TDNNs, and NG-SGD's low-rank
preconditioner is a poor fit for MXU-batched updates.  The TPU-native
substitute is available as ``OptimizerConfig(preconditioner="muon")``:
Newton-Schulz orthogonalized momentum (Shampoo family — steepest
descent under the spectral norm), whose whole preconditioning step is
matrix multiplies on the MXU.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import OptimizerConfig


def lr_schedule(cfg: OptimizerConfig, total_steps: int, num_jobs_multiplier: float = 1.0):
    """Exponential decay initial->final over total_steps (common.py:644-657)."""
    total = max(total_steps, 1)

    def schedule(step):
        frac = jnp.minimum(step / total, 1.0)
        lr = cfg.initial_lr * (cfg.final_lr / cfg.initial_lr) ** frac
        return lr * num_jobs_multiplier

    return schedule


def dropout_schedule(spec: str) -> Callable[[float], float]:
    """Parse nnet3 dropout schedules like '0,0@0.20,0.1@0.50,0'.

    Returns rate(train_fraction): piecewise-linear through the listed
    (fraction, value) knots; first entry is at fraction 0, last at 1.

    Standalone utility, deliberately NOT an OptimizerConfig knob: the
    reference passes --trainer.dropout-schedule on every recipe but none
    of the v1-v5 graphs contain a dropout component
    (run_xvector_new.sh:92-115,144), so there the flag is a silent no-op.
    Use this parser if you add dropout layers to a custom graph.
    """
    parts = spec.split(",")
    knots: list[Tuple[float, float]] = []
    for i, p in enumerate(parts):
        if "@" in p:
            v, f = p.split("@")
            knots.append((float(f), float(v)))
        else:
            knots.append((0.0 if i == 0 else 1.0, float(p)))
    knots.sort(key=lambda t: t[0])

    def rate(frac: float) -> float:
        if frac <= knots[0][0]:
            return knots[0][1]
        for (f0, v0), (f1, v1) in zip(knots, knots[1:]):
            if frac <= f1:
                w = 0.0 if f1 == f0 else (frac - f0) / (f1 - f0)
                return v0 + w * (v1 - v0)
        return knots[-1][1]

    return rate


def clip_update_norm(max_change: float) -> optax.GradientTransformation:
    """Kaldi --max-param-change: cap the global l2 of the (post-LR) update."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        gnorm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_change / (gnorm + 1e-12))
        return jax.tree.map(lambda u: u * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def proportional_shrink(
    shrink: float, schedule, exponent: float = 1.0
) -> optax.GradientTransformation:
    """params *= (1 - shrink*lr)^exponent: added as a decay term.

    The reference applies the (1 - shrink*lr) factor once per outer
    iteration (`train_cvector_dnn.py:285-296`), where one iteration is
    an archive of ~thousands of minibatches; ``exponent`` =
    iterations/total_steps spreads the same aggregate decay over
    per-minibatch steps (build_optimizer computes it from
    OptimizerConfig.shrink_iterations).

    Skips batch-norm scale parameters like Kaldi (shrinkage targets
    affine weights; shrinking BN scales fights the running stats).
    """

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("proportional_shrink requires params")
        lr = schedule(state.count)
        factor = 1.0 - (1.0 - shrink * lr) ** exponent

        def add_decay(path, u, p):
            is_bn = any(getattr(k, "key", None) == "batchnorm" for k in path)
            return u if is_bn else u - factor * p

        updates = jax.tree_util.tree_map_with_path(add_decay, updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def subtree_lr_factors(
    params, factors: Dict[str, float]
) -> optax.GradientTransformation:
    """Per-subtree LR scaling (set-learning-rate-factor equivalent).

    ``factors`` maps a top-level (or slash-joined) param-path prefix to a
    multiplier, e.g. {"am": 0.2} scales every update under params["am"].
    """

    def path_factor(path) -> float:
        keys = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(str(k) for k in keys)
        for prefix, f in factors.items():
            if joined == prefix or joined.startswith(prefix + "/"):
                return f
        return 1.0

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: u * path_factor(path), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    cfg: OptimizerConfig,
    total_steps: int,
    num_jobs_multiplier: float = 1.0,
    lr_factors: Optional[Dict[str, float]] = None,
) -> Tuple[optax.GradientTransformation, Callable]:
    """The full chain; returns (tx, lr_schedule_fn)."""
    sched = lr_schedule(cfg, total_steps, num_jobs_multiplier)
    if cfg.preconditioner == "muon" and cfg.l2_regularize > 0:
        raise ValueError(
            "l2_regularize is only implemented for the momentum-SGD chain "
            "(preconditioner='none'); with muon use proportional_shrink"
        )
    if cfg.preconditioner == "muon":
        # Shampoo-family NG-SGD substitute (see module deviation note):
        # Newton-Schulz orthogonalized momentum on matrix params (pure
        # MXU matmuls), Adam on the rest; LR schedule applied inside.
        base = optax.contrib.muon(
            learning_rate=lambda c: sched(c), beta=max(cfg.momentum, 0.9)
        )
        chain = [base, clip_update_norm(cfg.max_param_change)]
    elif cfg.preconditioner in ("none", ""):
        chain = [
            optax.trace(decay=cfg.momentum, nesterov=False),
            optax.scale_by_schedule(lambda c: -sched(c)),
            clip_update_norm(cfg.max_param_change),
        ]
        if cfg.l2_regularize > 0:
            # nnet3-train --l2-regularize-factor: gradient += l2 * params
            # before momentum/LR (L2 as part of the objective gradient)
            chain.insert(0, optax.add_decayed_weights(cfg.l2_regularize))
    else:
        raise ValueError(f"unknown preconditioner {cfg.preconditioner!r}")
    if lr_factors:
        chain.append(subtree_lr_factors(None, lr_factors))
    if cfg.proportional_shrink > 0:
        # reference guard (train_cvector_dnn.py:292-296): refuse configs
        # whose per-iteration factor is unstable at the peak LR — with
        # the fractional exponent, shrink*lr >= 1 would be NaN, so the
        # guard is load-bearing, not just advisory.
        check_shrink_guard(cfg, cfg.initial_lr * num_jobs_multiplier)
        exponent = min(1.0, cfg.shrink_iterations / max(total_steps, 1))
        chain.append(
            proportional_shrink(cfg.proportional_shrink, sched, exponent)
        )
    return optax.chain(*chain), sched


def check_shrink_guard(cfg: OptimizerConfig, lr: float) -> None:
    """train_cvector_dnn.py:292-296: refuse unstable shrinkage."""
    factor = 1.0 - cfg.proportional_shrink * lr
    if factor <= cfg.shrink_guard:
        raise ValueError(
            f"shrink factor {factor:.3f} <= guard {cfg.shrink_guard}: "
            "proportional-shrink too large for this learning rate"
        )
