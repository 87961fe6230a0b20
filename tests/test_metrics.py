"""EER/minDCF oracle tests: hand-computable score lists (SURVEY.md §4)."""

import numpy as np
import pytest

from sepi_tpu.metrics import (
    SRE08_DCF,
    SRE10_DCF,
    compute_det,
    eer,
    evaluate_scores,
    min_dcf,
)
from sepi_tpu.metrics.det import split_scores_by_trials


def test_perfect_separation():
    tgt = np.array([2.0, 3.0, 4.0])
    non = np.array([-1.0, 0.0, 1.0])
    assert eer(tgt, non) == pytest.approx(0.0, abs=1e-12)
    assert min_dcf(tgt, non, *SRE08_DCF) == pytest.approx(0.0, abs=1e-12)
    assert min_dcf(tgt, non, *SRE10_DCF) == pytest.approx(0.0, abs=1e-12)


def test_total_overlap_is_50pct():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=20000)
    e = eer(scores[:10000], scores[10000:])
    assert abs(e - 0.5) < 0.02


def test_hand_computed_eer():
    # targets: 1, 3 ; nontargets: 0, 2.
    # threshold sweep: accepting >=3: pm=.5 pf=0; >=2: pm=.5 pf=.5 (EER pt);
    # >=1: pm=0 pf=.5.  EER = 0.5.
    assert eer(np.array([1.0, 3.0]), np.array([0.0, 2.0])) == pytest.approx(0.5)


def test_eer_interpolated_crossing():
    # 4 targets / 4 nontargets with one overlapping nontarget.
    tgt = np.array([10.0, 9.0, 8.0, 7.0])
    non = np.array([7.5, 1.0, 0.5, 0.2])
    # accepting >= 7.5: pm=1/4, pf=1/4 -> EER exactly 0.25
    assert eer(tgt, non) == pytest.approx(0.25, abs=1e-9)


def test_min_dcf_hand_case():
    tgt = np.array([1.0, 3.0])
    non = np.array([0.0, 2.0])
    det = compute_det(tgt, non)
    # normalized dcf at P_tgt=0.01, C_miss=10, C_fa=1:
    # candidates over operating points (pm, pf):
    # (1,0): 10*.01*1 /0.1 = 1.0 ; (.5,0): .5 ; (.5,.5): (0.05+0.495)/0.1=5.45
    # (0,.5): .495/.1=4.95 ; (0,1): 9.9. min = 0.5
    assert det.min_dcf(*SRE08_DCF) == pytest.approx(0.5)


def test_monotone_transform_invariance():
    rng = np.random.default_rng(1)
    tgt = rng.normal(1.0, 1.0, 500)
    non = rng.normal(-1.0, 1.0, 800)
    r1 = evaluate_scores(tgt, non)
    r2 = evaluate_scores(np.tanh(tgt / 3), np.tanh(non / 3))
    assert r1.eer == pytest.approx(r2.eer, abs=1e-12)
    assert r1.min_dcf08 == pytest.approx(r2.min_dcf08, abs=1e-12)


def test_dcf12_is_mean():
    rng = np.random.default_rng(2)
    r = evaluate_scores(rng.normal(1, 1, 300), rng.normal(-1, 1, 300))
    assert r.dcf12 == pytest.approx((r.min_dcf08 + r.min_dcf10) / 2)


def test_split_scores_by_trials():
    scores = {("a", "x"): 1.0, ("a", "y"): -1.0}
    trials = [("a", "x", True), ("a", "y", False)]
    tgt, non = split_scores_by_trials(scores, trials)
    assert tgt.tolist() == [1.0] and non.tolist() == [-1.0]
    with pytest.raises(KeyError):
        split_scores_by_trials(scores, trials + [("b", "x", True)])


def test_known_auc_relationship():
    """EER of two unit-variance gaussians at distance d is Q(d/2)."""
    from math import erf, sqrt

    rng = np.random.default_rng(3)
    d = 2.0
    tgt = rng.normal(d, 1.0, 200000)
    non = rng.normal(0.0, 1.0, 200000)
    expected = 0.5 * (1 - erf(d / 2 / sqrt(2)))
    assert eer(tgt, non) == pytest.approx(expected, abs=0.005)


def test_ppndf_matches_normal_quantiles():
    from sepi_tpu.metrics import ppndf

    np.testing.assert_allclose(ppndf(np.array([0.5])), [0.0], atol=1e-9)
    np.testing.assert_allclose(
        ppndf(np.array([0.158655, 0.841345])), [-1.0, 1.0], atol=1e-4
    )
    # clipped, never inf
    assert np.all(np.isfinite(ppndf(np.array([0.0, 1.0]))))


def test_export_det_curve_text_and_svg(tmp_path, rng):
    from sepi_tpu.metrics import compute_det, export_det_curve, ppndf

    tgt = rng.normal(2.0, 1.0, size=8000)
    non = rng.normal(-2.0, 1.0, size=20000)
    curve = compute_det(tgt, non)
    txt = str(tmp_path / "det.txt")
    svg = str(tmp_path / "det.svg")
    export_det_curve(curve, txt)
    export_det_curve(curve, svg)
    rows = np.loadtxt(txt)
    # columns: p_fa p_miss ppndf(p_fa) ppndf(p_miss); probit consistency
    np.testing.assert_allclose(rows[:, 2], ppndf(rows[:, 0]), atol=1e-4)
    np.testing.assert_allclose(rows[:, 3], ppndf(rows[:, 1]), atol=1e-4)
    # for unit-variance symmetric Gaussians the probit DET is the line
    # ppndf(pm) = -d' - ppndf(pfa) with d'=4: check mid-curve points
    mid = rows[(rows[:, 0] > 0.02) & (rows[:, 0] < 0.3)]
    pred = -4.0 - mid[:, 2]
    assert np.median(np.abs(mid[:, 3] - pred)) < 0.15
    s = open(svg).read()
    assert "<polyline" in s and "Miss probability" in s
