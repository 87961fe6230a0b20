"""Structured metrics logging + profiling hooks.

Replaces the reference's observability layer (SURVEY.md §5): per-job
logfiles parsed by regex (`log_parse.py`) become structured jsonl
records; the every-20th-iteration GPU timing becomes an explicit JAX
profiler context writing XLA traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    """Append-only jsonl metrics stream + stderr echo."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, task: str, metrics: Dict[str, float]) -> None:
        rec = {"t": round(time.time() - self._t0, 3), "step": step, "task": task, **metrics}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self.echo:
            kv = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"[{rec['t']:8.1f}s] step {step:>6} {task:<5} {kv}", flush=True)

    # Trainer-compatible callable
    __call__ = log

    def close(self):
        if self._f:
            self._f.close()


@contextlib.contextmanager
def profile(log_dir: str, enabled: bool = True):
    """JAX profiler trace context (view with TensorBoard/xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
