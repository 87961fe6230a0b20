"""LDA+MLLT aligner-ladder stage (steps/train_lda_mllt.sh analog).

Unit pins: est-lda whitening invariant (W Sw W^T = I) and nuisance-dim
rejection; est-mllt decorrelation on a known mixing; splice clamping.
Integration pin: alignment frame accuracy IMPROVES with
AlignConfig(lda_mllt=True) on a corpus whose noise is correlated and
padded with nuisance dimensions — the regime the tri3b rung exists for
(`/root/reference/egs/sre/s5/run.sh:130-140`), measured the same way
tests/test_tied.py measures the tied-vs-mono gain.
"""

import numpy as np

from sepi_tpu.align import Lexicon
from sepi_tpu.align.lda_mllt import (
    apply_transform,
    estimate_lda,
    estimate_mllt,
    mllt_objf_improvement,
    splice_features,
)
from sepi_tpu.align.mono import SIL


def test_splice_shapes_and_edge_clamp(rng):
    x = rng.normal(size=(10, 3)).astype(np.float32)
    s = splice_features(x, context=2)
    assert s.shape == (10, 15)
    # first row: frames [-2,-1,0,1,2] all clamp to >= 0
    np.testing.assert_array_equal(s[0, :3], x[0])
    np.testing.assert_array_equal(s[0, 3:6], x[0])
    np.testing.assert_array_equal(s[0, 6:9], x[0])
    np.testing.assert_array_equal(s[0, 9:12], x[1])
    np.testing.assert_array_equal(s[-1, 12:], x[-1])


def _labeled_gaussians(rng, num_classes=6, d=5, n_per=400, mixing=None,
                       nuisance=0):
    """Per-class Gaussian frames as one 'utterance' per class."""
    feats, alis = {}, {}
    for c in range(num_classes):
        mu = np.zeros(d)
        mu[c % d] = 4.0
        x = mu + rng.normal(size=(n_per, d))
        if mixing is not None:
            x = x @ mixing.T
        if nuisance:
            x = np.concatenate(
                [x, 3.0 * rng.normal(size=(n_per, nuisance))], axis=1
            )
        feats[f"u{c}"] = x.astype(np.float32)
        alis[f"u{c}"] = np.full(n_per, c, np.int32)
    return feats, alis


def test_lda_whitens_within_class_and_drops_nuisance(rng):
    d, nuis = 5, 4
    feats, alis = _labeled_gaussians(rng, d=d, nuisance=nuis)
    w = estimate_lda(feats, alis, num_classes=6, context=1, dim=4)
    assert w.shape == (4, 3 * (d + nuis))
    # within-class covariance of the projected features is ~identity
    proj = apply_transform(feats, w, context=1)
    resid = []
    for u, x in proj.items():
        resid.append(x - x.mean(axis=0))
    r = np.concatenate(resid)
    cov = (r.T @ r) / len(r)
    np.testing.assert_allclose(cov, np.eye(4), atol=0.15)
    # nuisance columns (pure noise, no class signal) get ~zero weight:
    # compare within-class-normalized weights on signal vs nuisance cols
    cols = np.abs(w).reshape(4, 3, d + nuis).sum(axis=(0, 1))
    # nuisance dims have 3x the std; normalize weight by input std
    sig = cols[:d].mean()
    nz = cols[d:].mean() * 3.0
    assert nz < 0.25 * sig, f"nuisance weight {nz:.3f} vs signal {sig:.3f}"


def test_mllt_decorrelates_known_mixing(rng):
    d = 5
    mix = np.eye(d) + 0.6 * rng.normal(size=(d, d)) / np.sqrt(d)
    feats, alis = _labeled_gaussians(rng, d=d, mixing=mix)
    m = estimate_mllt(feats, alis, num_classes=6)
    gain = mllt_objf_improvement(feats, alis, 6, m)
    assert gain > 0.05, f"MLLT objf gain {gain:.4f} not positive"
    # transformed within-class residuals are nearly uncorrelated
    resid = []
    for u, x in feats.items():
        y = x @ m.T
        resid.append(y - y.mean(axis=0))
    r = np.concatenate(resid)
    cov = (r.T @ r) / len(r)
    corr = cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    off = np.abs(corr - np.diag(np.diag(corr))).max()
    # raw mixing produces strong correlations; MLLT must remove most
    raw = np.concatenate([x - x.mean(axis=0) for x in feats.values()])
    rc = (raw.T @ raw) / len(raw)
    rcorr = rc / np.sqrt(np.outer(np.diag(rc), np.diag(rc)))
    roff = np.abs(rcorr - np.diag(np.diag(rcorr))).max()
    assert off < 0.5 * roff, f"off-diag corr {off:.3f} vs raw {roff:.3f}"


def _correlated_world(num_utts=40, d=6, nuisance=8, seed=5):
    """Phone world where the aligner's diagonal GMMs are misspecified:
    informative dims share a strong correlated-noise mixing and
    high-variance nuisance dims are appended — LDA+MLLT's home turf.
    Calibration (seed 5): plain ladder 87.9% frame accuracy, lda_mllt
    91.5% — the tri3b-style gain this world exists to expose."""
    rng = np.random.default_rng(seed)
    names = [f"p{i}" for i in range(6)]
    means = {SIL: np.zeros(d)}
    for i, p in enumerate(names):
        mu = np.zeros(d)
        mu[i % d] = 3.0
        mu[(i + 1) % d] = 1.5
        means[p] = mu
    mix = np.eye(d) + 0.8 * rng.normal(size=(d, d)) / np.sqrt(d)
    words = {f"w{i}": [names[rng.integers(6)] for _ in range(2)]
             for i in range(8)}
    lex = Lexicon.from_dict(words)
    wlist = sorted(words)
    feats, trans, truth = {}, {}, {}
    for ui in range(num_utts):
        ws = [wlist[int(rng.integers(len(wlist)))] for _ in range(2)]
        phones = [SIL] + [p for w in ws for p in words[w]] + [SIL]
        xs, labels = [], []
        for p in phones:
            n = 8 + int(rng.integers(0, 4))
            seg = means[p] + rng.normal(size=(n, d)) * 2.0
            seg = seg @ mix.T
            seg = np.concatenate(
                [seg, 3.0 * rng.normal(size=(n, nuisance))], axis=1
            )
            xs.append(seg)
            labels.extend([p] * n)
        u = f"u{ui:03d}"
        feats[u] = np.concatenate(xs).astype(np.float32)
        trans[u] = ws
        truth[u] = labels
    return feats, trans, truth, lex


def _phone_accuracy(phone_ali, truth, phones):
    total = correct = 0
    for u, ph in phone_ali.items():
        hyp = [phones[int(p)] for p in ph]
        for h, t in zip(hyp, truth[u]):
            total += 1
            correct += h == t
    return correct / total


def test_lda_mllt_improves_alignment_accuracy():
    """The VERDICT item-8 pin: opt-in AlignConfig(lda_mllt=True) must
    improve frame phone accuracy over the plain ladder on the
    correlated-noise world, at an equal refine budget."""
    from sepi_tpu.config import AlignConfig
    from sepi_tpu.recipes.s5 import run_s5

    feats, trans, truth, lex = _correlated_world()
    base = dict(num_leaves=24, mono_iters=3, refine_iters=2, min_count=20.0)
    plain = run_s5(feats, trans, lex, AlignConfig(**base))
    ldamllt = run_s5(
        feats, trans, lex,
        AlignConfig(lda_mllt=True, lda_mllt_dim=6, splice_context=2,
                    mllt_iters=2, **base),
    )
    assert ldamllt.lda_mllt is not None and plain.lda_mllt is None
    assert ldamllt.lda_mllt.shape == (6, 5 * 14)  # ±2 splice x (6+8) dims
    acc_plain = _phone_accuracy(plain.phone_alignments, truth, lex.phones)
    acc_lm = _phone_accuracy(ldamllt.phone_alignments, truth, lex.phones)
    print(f"plain {acc_plain:.4f} -> lda+mllt {acc_lm:.4f}")
    assert acc_lm > acc_plain, (
        f"LDA+MLLT did not improve alignment: {acc_plain:.4f} -> {acc_lm:.4f}"
    )


def test_lda_mllt_composes_with_fmllr():
    """SAT on top of LDA+MLLT (tri4a-on-tri3b): transforms estimated in
    the projected space, alignments still full-coverage."""
    from sepi_tpu.config import AlignConfig
    from sepi_tpu.recipes.s5 import run_s5

    feats, trans, truth, lex = _correlated_world(num_utts=24)
    utt2spk = {u: f"s{int(u[1:]) % 4}" for u in feats}
    res = run_s5(
        feats, trans, lex,
        AlignConfig(num_leaves=24, mono_iters=3, refine_iters=2,
                    min_count=20.0, lda_mllt=True, lda_mllt_dim=6,
                    splice_context=2, mllt_iters=1, fmllr=True),
        utt2spk=utt2spk,
    )
    assert res.fmllr is not None and res.lda_mllt is not None
    # fMLLR transforms live in the 6-dim projected space
    w = next(iter(res.fmllr.values()))
    assert w.shape == (6, 7)
    assert set(res.alignments) == set(feats)
    for u in feats:
        assert len(res.alignments[u]) == len(feats[u])
