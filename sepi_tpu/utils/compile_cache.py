"""Persistent XLA compilation cache (process-spanning compile reuse).

The reference amortizes nothing: every Kaldi binary re-JITs nothing
because it ships precompiled C++.  Here the compute path is XLA, and on
a tunneled TPU backend a single program compile costs tens of seconds —
dominating short driver runs and any workflow that spawns fresh Python
processes (the CLI, bench.py, pytest).  JAX's persistent compilation
cache keys compiled executables by (HLO, compile options, backend
version) and reuses them across processes, so the second process pays
milliseconds instead.

Enabled idempotently by the CLI, bench.py and the gauntlet entry
points; set SEPI_TPU_NO_COMPILE_CACHE=1 to opt out (e.g. when
diagnosing a suspected stale-executable miscompile) or
JAX_COMPILATION_CACHE_DIR to relocate it.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's on-disk compilation cache (idempotent, best-effort)."""
    global _done
    if _done or os.environ.get("SEPI_TPU_NO_COMPILE_CACHE"):
        return
    _done = True
    path = (cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/sepi_tpu/xla"))
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache even quick compiles: the axon tunnel's fixed per-compile
        # round-trip cost is what we are amortizing, not compile CPU
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # never let cache setup break a real run
        _done = False
