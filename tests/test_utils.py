"""Artifact cache, metrics logging, condition reports, trainer diagnostics."""

import json
import os

import numpy as np
import pytest

from sepi_tpu.data.manifest import Trial, Utterance
from sepi_tpu.metrics.report import evaluate_conditions, format_report, metadata_condition
from sepi_tpu.utils.artifacts import ArtifactCache, config_key
from sepi_tpu.utils.logging import MetricsLogger


def test_config_key_stability():
    from sepi_tpu.config import FrontendConfig

    a = config_key(FrontendConfig(), {"x": 1})
    b = config_key(FrontendConfig(), {"x": 1})
    c = config_key(FrontendConfig(num_ceps=20), {"x": 1})
    assert a == b and a != c
    arr = np.arange(5)
    assert config_key(arr) == config_key(arr.copy())
    assert config_key(arr) != config_key(arr + 1)


def test_artifact_cache_run_or_load(tmp_path):
    cache = ArtifactCache(str(tmp_path))
    calls = []

    def fn():
        calls.append(1)
        return {"emb": {"u1": np.ones(3)}, "count": np.array(2)}

    out1 = cache.stage("extract", {"cfg": 1}, fn)
    out2 = cache.stage("extract", {"cfg": 1}, fn)
    assert len(calls) == 1  # second call was a cache hit
    np.testing.assert_array_equal(out1["emb"]["u1"], out2["emb"]["u1"])
    out3 = cache.stage("extract", {"cfg": 2}, fn)
    assert len(calls) == 2  # different config -> recompute


def test_metrics_logger_jsonl(tmp_path):
    p = str(tmp_path / "log" / "m.jsonl")
    lg = MetricsLogger(p, echo=False)
    lg(10, "xvec", {"objf": -1.5})
    lg(20, "am", {"objf": -2.0, "accuracy": 0.4})
    lg.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["step"] == 10 and recs[1]["task"] == "am"


def test_evaluate_conditions(rng):
    trials = []
    scores = {}
    utts = {}
    for i in range(200):
        gender = "m" if i % 2 else "f"
        utt = f"t{i}"
        utts[utt] = Utterance(utt, f"s{i % 10}", meta=(("gender", gender),))
        target = i % 4 < 2  # targets land in both genders
        trials.append(Trial("model", utt, target))
        scores[("model", utt)] = rng.normal() + (2.5 if target else 0.0)
    res = evaluate_conditions(scores, trials, metadata_condition(utts, "gender"))
    assert set(res) == {"pooled", "gender:m", "gender:f"}
    assert res["pooled"].num_target == 100
    rpt = format_report(res)
    assert "pooled" in rpt and "gender:m" in rpt


def test_trainer_divergence_guard(rng):
    import jax.numpy as jnp

    from sepi_tpu.data.sampler import ChunkBatch
    from sepi_tpu.train import Trainer

    class FakeState:
        pass

    def bad_step(state, feats, labels, w):
        return state, {"objf": jnp.asarray(float("nan"))}

    batches = [ChunkBatch(np.zeros((2, 4, 3), np.float32), np.zeros(2, np.int32), 4)]
    tr = Trainer(steps={"xvec": bad_step}, state=FakeState(), log_every=1)
    with pytest.raises(RuntimeError, match="diverged"):
        tr.run(iter(batches), num_steps=1)

@pytest.mark.slow

def test_trainer_valid_diagnostics(rng):
    """Held-out diagnostics recorded as valid:<task> rows."""
    import dataclasses as dc

    from tests.test_train import CFG, _make_setup, _separable_batch
    from sepi_tpu.data.sampler import ChunkBatch
    from sepi_tpu.train import Trainer
    from sepi_tpu.train.trainer import make_eval_step

    model, tx, state, step, feats, labels = _make_setup(rng)
    vfeats, vlabels = _separable_batch(rng)
    batches = [ChunkBatch(feats, labels, feats.shape[1], "xvec")] * 20
    tr = Trainer(
        steps={"xvec": step}, state=state, log_every=10,
        valid_batches=[ChunkBatch(vfeats, vlabels, vfeats.shape[1], "xvec")],
        eval_steps={"xvec": make_eval_step(model)}, eval_every=10,
    )
    tr.run(iter(batches), num_steps=20)
    valid_rows = [h for h in tr.history if h[1] == "valid:xvec"]
    assert len(valid_rows) == 2
