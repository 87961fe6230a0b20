"""Multi-host initialization ordering + failure policy (VERDICT r1 weak #1):
`jax.distributed.initialize` must run before any backend-touching call,
and explicit multi-host launches must never silently degrade to
disconnected single-host runs."""

import jax
import pytest

from sepi_tpu.parallel import multihost


def test_initialize_orders_distributed_before_backend(monkeypatch):
    """No backend probe (process_count/devices) may precede distributed
    init — probing initializes the local backend irreversibly."""
    order = []
    monkeypatch.setattr(jax, "process_count", lambda: order.append("probe") or 1)
    monkeypatch.setattr(jax, "devices", lambda *a: order.append("probe") or [])
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: order.append("init")
    )
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False, raising=False)
    multihost.initialize()
    assert order == ["init"]


def test_initialize_explicit_multihost_failure_raises(monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False, raising=False)
    with pytest.raises(RuntimeError, match="refusing to degrade"):
        multihost.initialize("10.0.0.1:8476", num_processes=2, process_id=0)
    with pytest.raises(RuntimeError, match="refusing to degrade"):
        multihost.initialize(coordinator_address="10.0.0.1:8476")


def test_initialize_autodetect_falls_back_to_local(monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("no cluster env detected")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False, raising=False)
    multihost.initialize()  # bare auto-detect: single-host fallback, no raise


def test_initialize_noop_when_already_initialized(monkeypatch):
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: calls.append(1)
    )
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True, raising=False)
    multihost.initialize()
    assert calls == []
