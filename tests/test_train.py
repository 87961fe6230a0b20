"""Trainer/optimizer tests: schedules, clipping, shrinkage, learning, DP."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sepi_tpu.config import OptimizerConfig
from sepi_tpu.data.sampler import ChunkBatch
from sepi_tpu.models import XVector, XVectorConfig
from sepi_tpu.parallel import make_mesh
from sepi_tpu.train import (
    Trainer,
    build_optimizer,
    combine_checkpoints,
    create_train_state,
    dropout_schedule,
    finalize_batch_stats,
    load_checkpoint,
    lr_schedule,
    save_checkpoint,
)
from sepi_tpu.train.optim import check_shrink_guard, subtree_lr_factors
from sepi_tpu.train.trainer import make_eval_step, make_xvec_step

CFG = XVectorConfig(
    feat_dim=8,
    num_speakers=4,
    frame_specs=(
        # tiny net for fast tests, same structural elements as v2
        *(XVectorConfig().frame_specs[:3]),
    ),
    embed_dim=32,
)
# shrink dims
import dataclasses

from sepi_tpu.models.tdnn import TdnnSpec

CFG = dataclasses.replace(
    CFG,
    frame_specs=(
        TdnnSpec(16, (-2, -1, 0, 1, 2)),
        TdnnSpec(16, (-2, 0, 2)),
        TdnnSpec(48, (0,)),
    ),
)


def _separable_batch(rng, n=32, t=30, d=8, num_spk=4):
    labels = rng.integers(0, num_spk, size=n).astype(np.int32)
    centers = np.eye(num_spk, d) * 3.0
    feats = (
        rng.normal(size=(n, t, d)) * 0.3 + centers[labels][:, None, :]
    ).astype(np.float32)
    return feats, labels


def test_lr_schedule_endpoints():
    cfg = OptimizerConfig(initial_lr=1e-3, final_lr=1e-4)
    s = lr_schedule(cfg, total_steps=100)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(1e-4)
    assert float(s(200)) == pytest.approx(1e-4)  # clamped past end
    s2 = lr_schedule(cfg, 100, num_jobs_multiplier=4.0)
    assert float(s2(0)) == pytest.approx(4e-3)


def test_dropout_schedule_parse():
    r = dropout_schedule("0,0@0.20,0.1@0.50,0")
    assert r(0.0) == 0.0 and r(0.1) == 0.0 and r(0.2) == 0.0
    assert r(0.35) == pytest.approx(0.05)
    assert r(0.5) == pytest.approx(0.1)
    assert r(0.75) == pytest.approx(0.05)
    assert r(1.0) == 0.0


def test_shrink_guard():
    cfg = OptimizerConfig(proportional_shrink=10.0)
    check_shrink_guard(cfg, 0.01)  # factor 0.9, fine
    with pytest.raises(ValueError):
        check_shrink_guard(cfg, 0.06)  # factor 0.4 <= 0.5


def test_max_param_change_clips():
    cfg = OptimizerConfig(max_param_change=0.1, momentum=0.0, proportional_shrink=0.0)
    tx, _ = build_optimizer(cfg, total_steps=10)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    big_grads = {"w": jnp.full((4,), 1e6)}
    updates, _ = tx.update(big_grads, state, params)
    assert float(optax.global_norm(updates)) <= 0.1 + 1e-6


def test_subtree_lr_factor_scales_only_prefix():
    params = {"am": {"w": jnp.ones(3)}, "seg": {"w": jnp.ones(3)}}
    tx = subtree_lr_factors(params, {"am": 0.25})
    updates, _ = tx.update(params, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["am"]["w"]), 0.25)
    np.testing.assert_allclose(np.asarray(updates["seg"]["w"]), 1.0)


def _make_setup(rng, mesh=None, total_steps=60):
    model = XVector(CFG)
    # reference-semantics chain (momentum SGD): these tests pin exact
    # update behavior (DP-vs-single-device roundoff parity etc.), which
    # the default muon preconditioner intentionally does not preserve —
    # Newton-Schulz orthogonalization amplifies reassociation roundoff
    opt_cfg = OptimizerConfig(initial_lr=0.05, final_lr=0.01,
                              proportional_shrink=1.0, preconditioner="none")
    tx, _ = build_optimizer(opt_cfg, total_steps)
    feats, labels = _separable_batch(rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), feats[:2])
    step = make_xvec_step(model, tx, mesh=mesh)
    return model, tx, state, step, feats, labels


def test_training_learns(rng):
    model, tx, state, step, feats, labels = _make_setup(rng)
    w = jnp.float32(1.0)
    state, m0 = step(state, feats, labels, w)
    for _ in range(40):
        state, m = step(state, feats, labels, w)
    assert float(m["objf"]) > float(m0["objf"]) + 0.5
    assert float(m["accuracy"]) > 0.9


def test_trainer_loop_and_eval(rng):
    model, tx, state, step, feats, labels = _make_setup(rng)
    batches = [ChunkBatch(feats, labels, feats.shape[1], "xvec")] * 40
    tr = Trainer(steps={"xvec": step}, state=state, log_every=20)
    tr.run(iter(batches), num_steps=40)
    # Kaldi-style exact BN stats before inference (EMA alone is biased
    # after so few steps; see finalize_batch_stats docstring).
    final = finalize_batch_stats(model, tr.state, [feats, feats])
    ev = make_eval_step(model)
    metrics = ev(final, feats, labels)
    assert float(metrics["accuracy"]) > 0.9
    assert len(tr.history) == 2


def test_data_parallel_matches_single_device(rng):
    """The gradient-psum DP step must agree with single-device training.

    GSPMD is semantics-preserving but not bitwise: sharded reductions
    reassociate f32 sums, so agreement is to roundoff at step 1 and the
    difference grows with training dynamics.  We assert (a) tight
    agreement after one step, (b) both runs learn to high accuracy.
    """
    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.devices.size == 8
    model, tx, state0, step_dp, feats, labels = _make_setup(rng, mesh=mesh)
    _, _, _, step_1, _, _ = _make_setup(rng, mesh=None)

    state_a = jax.tree.map(lambda x: x.copy(), state0)
    state_b = jax.tree.map(lambda x: x.copy(), state0)
    w = jnp.float32(1.0)
    state_a, ma = step_dp(state_a, feats, labels, w)
    state_b, mb = step_1(state_b, feats, labels, w)
    assert float(ma["objf"]) == pytest.approx(float(mb["objf"]), abs=5e-4)
    la = state_a.params["segment"]["tdnn6"]["affine"]["kernel"]
    lb = state_b.params["segment"]["tdnn6"]["affine"]["kernel"]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=5e-3)
    for _ in range(40):
        state_a, ma = step_dp(state_a, feats, labels, w)
        state_b, mb = step_1(state_b, feats, labels, w)
    assert float(ma["accuracy"]) > 0.9 and float(mb["accuracy"]) > 0.9


def test_data_parallel_default_optimizer_learns(rng):
    """The DEFAULT (muon) chain under the mesh: no roundoff-parity claim
    (orthogonalization amplifies reassociation noise by design), but the
    sharded step must train to the same high accuracy as single-device."""
    mesh = make_mesh()
    model = XVector(CFG)
    tx, _ = build_optimizer(OptimizerConfig(initial_lr=0.03, final_lr=0.01), 50)
    feats, labels = _separable_batch(rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), feats[:2])
    step = make_xvec_step(model, tx, mesh=mesh)
    w = jnp.float32(1.0)
    for _ in range(40):
        state, m = step(state, feats, labels, w)
    assert float(m["accuracy"]) > 0.9


def test_checkpoint_roundtrip_and_combine(rng):
    model, tx, state, step, feats, labels = _make_setup(rng)
    w = jnp.float32(1.0)
    with tempfile.TemporaryDirectory() as d:
        for i in range(6):
            state, _ = step(state, feats, labels, w)
            save_checkpoint(state, d, i, keep_every=2)
        restored = load_checkpoint(state, d, 5)
        np.testing.assert_allclose(
            np.asarray(restored.params["segment"]["tdnn6"]["affine"]["kernel"]),
            np.asarray(state.params["segment"]["tdnn6"]["affine"]["kernel"]),
        )
        ev = make_eval_step(model)
        best, objf = combine_checkpoints(
            state, d, lambda s: float(ev(s, feats, labels)["objf"]), num_tail=4
        )
        assert objf >= float(ev(load_checkpoint(state, d, 5), feats, labels)["objf"]) - 1e-6


def test_checkpoint_pruning(rng):
    model, tx, state, step, feats, labels = _make_setup(rng)
    with tempfile.TemporaryDirectory() as d:
        for i in range(30):
            save_checkpoint(state, d, i, keep_every=10, max_keep=5)
        names = sorted(os.listdir(d))
        # every-10th preserved + last 5 kept
        kept = {int(n.split("_")[1].split(".")[0]) for n in names}
        assert {0, 10, 20} <= kept
        assert {25, 26, 27, 28, 29} <= kept
        assert 13 not in kept

@pytest.mark.slow

def test_multitask_data_parallel_steps(rng):
    """Both heads of a multitask model train under the 8-device mesh."""
    from sepi_tpu.models import MultitaskConfig, MultitaskCVector
    from sepi_tpu.train.trainer import make_am_step

    mesh = make_mesh()
    cfg = MultitaskConfig(
        num_speakers=4, num_senones=6, embed_dim=16, hidden_dim=8, pool_dim=16
    )
    model = MultitaskCVector(cfg)
    opt_cfg = OptimizerConfig(initial_lr=0.02, final_lr=0.01, proportional_shrink=0.0)
    tx, _ = build_optimizer(opt_cfg, 20)
    feats = rng.normal(size=(16, 40, 23)).astype(np.float32)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), feats, model_kwargs={"task": "both"}
    )
    xstep = make_xvec_step(model, tx, task_kwargs={"task": "xvec"}, mesh=mesh)
    astep = make_am_step(model, tx, task_kwargs={"task": "am"}, mesh=mesh)
    labels = rng.integers(0, 4, size=16).astype(np.int32)
    l, r = cfg.am_context
    am_labels = rng.integers(0, 6, size=(16, 40 - l - r)).astype(np.int32)
    w = jnp.float32(1.0)
    state, m1 = xstep(state, feats, labels, w)
    state, m2 = astep(state, feats, am_labels, w)
    assert np.isfinite(float(m1["objf"])) and np.isfinite(float(m2["objf"]))

@pytest.mark.slow

def test_resume_from_checkpoint_dir(rng, tmp_path):
    """train_xvector_model resumes from an existing checkpoint dir."""
    from sepi_tpu.data import make_synthetic_corpus
    from sepi_tpu.recipes import prepare_features_nosil, train_xvector_model
    from sepi_tpu.config import ChunkConfig, TrainConfig as TC
    from sepi_tpu.models import XVectorConfig
    from sepi_tpu.models.tdnn import TdnnSpec
    from sepi_tpu.train.checkpoint import latest_checkpoint

    corpus = make_synthetic_corpus(num_speakers=4, utts_per_speaker=3, duration_sec=2.0)
    nosil = prepare_features_nosil(corpus.audio)
    cfg = XVectorConfig(feat_dim=23, num_speakers=4,
                        frame_specs=(TdnnSpec(8, (-2, -1, 0, 1, 2)), TdnnSpec(16, (0,))),
                        embed_dim=8)
    tc = TC(chunks=ChunkConfig(min_chunk_len=30, max_chunk_len=50, num_buckets=1),
            batch_size=8, checkpoint_every=10)
    d = str(tmp_path)
    train_xvector_model(nosil, corpus.dataset, cfg, tc, num_steps=20, checkpoint_dir=d)
    assert latest_checkpoint(d) == 20
    # "resume": asking for 30 total only runs 10 more
    train_xvector_model(nosil, corpus.dataset, cfg, tc, num_steps=30, checkpoint_dir=d)
    assert latest_checkpoint(d) == 30


@pytest.mark.slow
def test_profile_traces_written_per_segment(rng, tmp_path):
    """TrainConfig(profile=True): one XLA trace per checkpoint segment
    under <workdir>/profile/seg<start>-<end> (VERDICT r4 item 9 — the
    observability closer for SURVEY §5's 'use the JAX profiler' plan)."""
    import os

    from sepi_tpu.config import ChunkConfig, TrainConfig as TC
    from sepi_tpu.data import make_synthetic_corpus
    from sepi_tpu.models import XVectorConfig
    from sepi_tpu.models.tdnn import TdnnSpec
    from sepi_tpu.recipes import prepare_features_nosil, train_xvector_model

    corpus = make_synthetic_corpus(num_speakers=3, utts_per_speaker=3, duration_sec=1.5)
    nosil = prepare_features_nosil(corpus.audio)
    cfg = XVectorConfig(feat_dim=23, num_speakers=3,
                        frame_specs=(TdnnSpec(8, (-1, 0, 1)), TdnnSpec(16, (0,))),
                        embed_dim=8)
    tc = TC(chunks=ChunkConfig(min_chunk_len=30, max_chunk_len=50, num_buckets=1),
            batch_size=8, checkpoint_every=10, profile=True)
    train_xvector_model(nosil, corpus.dataset, cfg, tc, num_steps=20,
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        num_heldout_utts=0)
    segs = sorted(os.listdir(tmp_path / "profile"))
    assert segs == ["seg0-10", "seg10-20"]
    for seg in segs:
        files = [f for _, _, fs in os.walk(tmp_path / "profile" / seg) for f in fs]
        assert files, f"no trace files in {seg}"


def test_mesh_parallel_extraction_matches_single_device(rng):
    """Extraction sharded over the 8-device mesh (the nj=32 run.pl
    fan-out, on ICI) produces the same embeddings as single-device."""
    import jax

    from sepi_tpu.config import ExtractConfig
    from sepi_tpu.extract import EmbeddingExtractor
    from sepi_tpu.models import XVector, XVectorConfig
    from sepi_tpu.models.tdnn import TdnnSpec
    from sepi_tpu.parallel.mesh import make_mesh

    cfg = XVectorConfig(
        feat_dim=10, num_speakers=4, embed_dim=16,
        frame_specs=(TdnnSpec(12, (-2, -1, 0, 1, 2)), TdnnSpec(24, (0,))),
    )
    model = XVector(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 40, 10), np.float32), train=False)
    feats = {f"u{i}": rng.normal(size=(60 + 7 * i, 10)).astype(np.float32)
             for i in range(13)}
    ecfg = ExtractConfig(min_chunk_size=25, chunk_size=64, batch_size=8)
    single = EmbeddingExtractor(model, variables, ecfg, min_frames=cfg.min_frames)
    sharded = EmbeddingExtractor(model, variables, ecfg, min_frames=cfg.min_frames,
                                 mesh=make_mesh(8))
    e1 = single.extract_utterances(feats)
    e2 = sharded.extract_utterances(feats)
    assert set(e1) == set(e2)
    for u in e1:
        np.testing.assert_allclose(e2[u], e1[u], rtol=1e-5, atol=1e-5)


def test_mesh_extraction_rejects_indivisible_batch():
    import jax
    import pytest as _pytest

    from sepi_tpu.config import ExtractConfig
    from sepi_tpu.extract import EmbeddingExtractor
    from sepi_tpu.models import XVector, XVectorConfig
    from sepi_tpu.models.tdnn import TdnnSpec
    from sepi_tpu.parallel.mesh import make_mesh

    cfg = XVectorConfig(feat_dim=4, num_speakers=2, embed_dim=8,
                        frame_specs=(TdnnSpec(8, (0,)),))
    model = XVector(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 30, 4), np.float32), train=False)
    with _pytest.raises(ValueError, match="divisible"):
        EmbeddingExtractor(model, variables,
                           ExtractConfig(batch_size=6), mesh=make_mesh(8))


def test_superstep_matches_single_dispatch(rng):
    """One K=4 superstep = 4 single dispatches: the scanned body is the
    same program, so the first step is bitwise and the per-step objf
    sequence tracks to compile-variation roundoff (a high-LR batch-norm
    net amplifies ulp-level differences chaotically, so long-horizon
    bitwise equality is not a meaningful target)."""
    from sepi_tpu.train import make_superstep

    model = XVector(CFG)
    # reference-semantics chain: parity claims need the linear momentum
    # update (see _make_setup note on the muon default)
    opt_cfg = OptimizerConfig(initial_lr=0.005, final_lr=0.005,
                              proportional_shrink=0.0, preconditioner="none")
    tx, _ = build_optimizer(opt_cfg, 60)
    seq = [_separable_batch(rng, n=16) for _ in range(4)]
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), seq[0][0][:2])
    step = make_xvec_step(model, tx)
    sstep = make_superstep(model, tx)

    sa = jax.tree.map(lambda x: x.copy(), state0)
    objs = []
    for f, l in seq:
        sa, m = step(sa, f, l, jnp.float32(1.0))
        objs.append(float(m["objf"]))
    sb, mb = sstep(
        jax.tree.map(lambda x: x.copy(), state0),
        np.stack([f for f, _ in seq]),
        np.stack([l for _, l in seq]),
        np.ones(4, np.float32),
    )
    assert int(sa.step) == int(sb.step) == 4
    sup = np.asarray(mb["objf"])
    assert float(sup[0]) == objs[0]  # first step: identical program state
    np.testing.assert_allclose(sup, objs, rtol=2e-3, atol=2e-3)
    a = sa.params["segment"]["tdnn6"]["affine"]["kernel"]
    b = sb.params["segment"]["tdnn6"]["affine"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_superstep_trainer_accounting(rng):
    """Trainer with steps_per_dispatch=4 over 18 steps: 4 supersteps + 2
    trailing singles, exact step count, logs at/after each log_every
    boundary, and the model still learns."""
    from sepi_tpu.train import make_superstep

    model, tx, state0, step, feats, labels = _make_setup(rng)
    batches = []
    for _ in range(18):
        f, l = _separable_batch(rng, n=16)
        batches.append(ChunkBatch(f, l, f.shape[1], "xvec"))
    sstep = make_superstep(model, tx)
    tr = Trainer(steps={"xvec": step}, state=state0, log_every=6,
                 supersteps={"xvec": sstep}, steps_per_dispatch=4)
    tr.run(iter(batches), num_steps=18)
    assert int(tr.state.step) == 18
    # boundaries 6, 12, 18 are recorded at the first dispatch that crosses
    assert [h[0] for h in tr.history] == [8, 12, 18]
    assert all(np.isfinite(h[2]["objf"]) for h in tr.history)

@pytest.mark.slow

def test_superstep_flushes_on_shape_or_task_change(rng):
    """Mixed-shape and mixed-task streams: buffered runs flush as
    singles, total step count is exact."""
    from sepi_tpu.train import make_superstep

    model, tx, state0, step, feats, labels = _make_setup(rng)
    seqs = []
    for t in (30, 30, 30, 24, 24, 30, 30, 30, 30, 24):
        f, l = _separable_batch(rng, n=16, t=t)
        seqs.append(ChunkBatch(f, l, t, "xvec"))
    sstep = make_superstep(model, tx)
    tr = Trainer(steps={"xvec": step}, state=state0, log_every=5,
                 supersteps={"xvec": sstep}, steps_per_dispatch=3)
    tr.run(iter(seqs), num_steps=10)
    assert int(tr.state.step) == 10


def test_superstep_data_parallel_mesh(rng):
    """Superstep scan under the 8-device mesh agrees with the
    single-device superstep."""
    from sepi_tpu.train import make_superstep

    mesh = make_mesh()
    model = XVector(CFG)
    # reference-semantics chain: parity claims need the linear momentum
    # update (see _make_setup note on the muon default)
    opt_cfg = OptimizerConfig(initial_lr=0.005, final_lr=0.005,
                              proportional_shrink=0.0, preconditioner="none")
    tx, _ = build_optimizer(opt_cfg, 60)
    fs, ls, ws = [], [], []
    for _ in range(4):
        f, l = _separable_batch(rng, n=16)
        fs.append(f); ls.append(l); ws.append(1.0)
    feats = np.stack(fs); labels = np.stack(ls)
    weights = np.asarray(ws, np.float32)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), fs[0][:2])
    s_mesh = make_superstep(model, tx, mesh=mesh)
    s_one = make_superstep(model, tx)
    sa, ma = s_mesh(jax.tree.map(lambda x: x.copy(), state0), feats, labels, weights)
    sb, mb = s_one(jax.tree.map(lambda x: x.copy(), state0), feats, labels, weights)
    # sharded reductions reassociate f32 sums (see
    # test_data_parallel_matches_single_device): tight at step 1, loose
    # over the window as batch-norm dynamics amplify roundoff
    assert float(np.asarray(ma["objf"])[0]) == pytest.approx(
        float(np.asarray(mb["objf"])[0]), abs=5e-4
    )
    np.testing.assert_allclose(np.asarray(ma["objf"]), np.asarray(mb["objf"]),
                               rtol=2e-2, atol=5e-3)
    a = sa.params["segment"]["tdnn6"]["affine"]["kernel"]
    b = sb.params["segment"]["tdnn6"]["affine"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
    assert int(sa.step) == 4


def test_parameter_progress(rng):
    """nnet3-show-progress analog: zero for identical params, per-
    component relative change after training, and logged as 'progress'
    rows at checkpoint boundaries."""
    from sepi_tpu.train.checkpoint import parameter_progress

    model, tx, state, step, feats, labels = _make_setup(rng)
    p0 = jax.device_get(state.params)
    same = parameter_progress(p0, p0)
    assert set(same) == set(p0)
    assert all(v == 0.0 for v in same.values())
    for _ in range(5):
        state, _ = step(state, feats, labels, jnp.float32(1.0))
    prog = parameter_progress(p0, jax.device_get(state.params))
    assert all(v > 0.0 for v in prog.values())
    assert all(np.isfinite(v) for v in prog.values())


def test_progress_logged_at_checkpoints(rng, tmp_path):
    from sepi_tpu.data import make_synthetic_corpus
    from sepi_tpu.recipes import prepare_features_nosil, train_xvector_model
    from sepi_tpu.config import ChunkConfig, TrainConfig as TC
    from sepi_tpu.models import XVectorConfig
    from sepi_tpu.models.tdnn import TdnnSpec

    corpus = make_synthetic_corpus(num_speakers=4, utts_per_speaker=3, duration_sec=2.0)
    nosil = prepare_features_nosil(corpus.audio)
    cfg = XVectorConfig(feat_dim=23, num_speakers=4,
                        frame_specs=(TdnnSpec(8, (-2, -1, 0, 1, 2)), TdnnSpec(16, (0,))),
                        embed_dim=8)
    tc = TC(chunks=ChunkConfig(min_chunk_len=30, max_chunk_len=50, num_buckets=1),
            batch_size=8, checkpoint_every=10)
    rows = []
    train_xvector_model(nosil, corpus.dataset, cfg, tc, num_steps=20,
                        checkpoint_dir=str(tmp_path),
                        log=lambda n, task, m: rows.append((n, task, m)))
    prog = [(n, m) for n, task, m in rows if task == "progress"]
    assert [n for n, _ in prog] == [10, 20]
    assert all(v > 0 for _, m in prog for v in m.values())


def test_shrink_iteration_cadence():
    """Shrink decays by (1-shrink*lr) per reference ITERATION, spread
    over steps: with zero gradients, total decay over total_steps equals
    the per-iteration product, not a per-minibatch product (which
    collapses weights at scale — observed as exactly-uniform logits
    after ~1k steps on a 200-speaker corpus)."""
    cfg = OptimizerConfig(initial_lr=0.01, final_lr=0.01, momentum=0.0,
                          proportional_shrink=10.0, shrink_iterations=5)
    T = 50
    tx, _ = build_optimizer(cfg, T)
    params = {"w": jnp.ones((4,)), "batchnorm": {"scale": jnp.ones((4,))}}
    st = tx.init(params)
    zero = jax.tree.map(jnp.zeros_like, params)
    for _ in range(T):
        upd, st = tx.update(zero, st, params)
        params = optax.apply_updates(params, upd)
    expect = (1 - 10 * 0.01) ** 5
    np.testing.assert_allclose(np.asarray(params["w"]), expect, rtol=1e-5)
    # batch-norm scales are exempt from shrinkage (Kaldi semantics)
    np.testing.assert_allclose(np.asarray(params["batchnorm"]["scale"]), 1.0)


def test_build_optimizer_rejects_unstable_shrink():
    """The shrink guard is load-bearing at build time: with the
    fractional-exponent decay, shrink*lr >= 1 would produce NaN updates
    rather than the old (finite) over-decay, so unstable configs are
    refused up front (train_cvector_dnn.py:292-296 semantics)."""
    with pytest.raises(ValueError, match="shrink factor"):
        build_optimizer(
            OptimizerConfig(initial_lr=0.15, proportional_shrink=10.0), 100
        )
    # num_jobs multiplier counts toward the peak LR
    with pytest.raises(ValueError, match="shrink factor"):
        build_optimizer(
            OptimizerConfig(initial_lr=0.02, proportional_shrink=10.0), 100,
            num_jobs_multiplier=8.0,
        )


def test_l2_regularize_decays_weights():
    """nnet3-train --l2-regularize-factor analog: with zero gradients and
    no shrink, params decay by lr*l2 per step through the momentum/LR
    chain."""
    cfg = OptimizerConfig(initial_lr=0.1, final_lr=0.1, momentum=0.0,
                          proportional_shrink=0.0, l2_regularize=0.5,
                          max_param_change=100.0, preconditioner="none")
    tx, _ = build_optimizer(cfg, 10)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    upd, st = tx.update({"w": jnp.zeros((3,))}, st, params)
    params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), 1.0 - 0.1 * 0.5, rtol=1e-6)
