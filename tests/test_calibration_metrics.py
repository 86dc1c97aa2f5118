"""Direction/behavior pins for the ensemble-calibration metrics.

VERDICT r3 weak-item 4: the calibration metrics were emitted but their
directions were undocumented, making tables like probe-4194's guided
rank-reliability 0.68 vs unconditional 0.33 easy to read backwards.  These
tests pin, on synthetic ensembles with known calibration, that

  * a perfectly calibrated ensemble scores spread/skill ~= 1, a near-flat
    rank histogram, and reliability_index ~= 0 (LOWER is better);
  * an overdispersed ensemble (the untuned-guidance failure mode) scores
    spread/skill >> 1, a center-heavy rank histogram, and a larger
    reliability index;
  * an underdispersed ensemble scores spread/skill << 1 and a U-shaped
    histogram;
  * the fair CRPS estimator (Ferro 2014) is ensemble-size unbiased.

Reference counterpart: none (the reference computes only W2/MELR/SSIM,
exp/metrics.py:219-296); these metrics are beyond-parity additions.
"""

import numpy as np

from climate2weather_tpu.exp.metrics import (
    crps_ensemble,
    rank_histogram,
    reliability_index,
    spread_skill_ratio,
)


def _ensemble(rng, S, T=16, H=16, W=16, member_scale=1.0):
    """Truth ~ N(0,1); members ~ N(0, member_scale^2), all iid."""
    gt = rng.standard_normal((T, H, W))
    samples = member_scale * rng.standard_normal((S, T, H, W))
    return samples, gt


def test_calibrated_ensemble_is_ideal_on_all_three():
    rng = np.random.default_rng(0)
    samples, gt = _ensemble(rng, S=20)
    ss = spread_skill_ratio(samples, gt)
    assert 0.9 < float(ss.mean()) < 1.1
    hist = rank_histogram(samples, gt)
    # flat to within sampling noise: every bin within 25% of uniform
    f = hist / hist.sum()
    assert np.all(np.abs(f - 1 / len(f)) < 0.25 / len(f) * 5)
    ri = reliability_index(hist)
    assert ri < 0.15  # ~0.07 expected from sampling noise at this N


def test_overdispersed_ensemble_reads_high():
    """The untuned-guidance signature: spread/skill ~2.5, center-heavy
    histogram, reliability index well above the calibrated ensemble's."""
    rng = np.random.default_rng(1)
    samples, gt = _ensemble(rng, S=20, member_scale=2.5)
    ss = spread_skill_ratio(samples, gt)
    assert float(ss.mean()) > 2.0
    hist = rank_histogram(samples, gt)
    mid = hist[len(hist) // 2]
    assert mid > 2 * hist[0] and mid > 2 * hist[-1]  # ∩ shape
    assert reliability_index(hist) > 0.4


def test_underdispersed_ensemble_reads_low():
    rng = np.random.default_rng(2)
    samples, gt = _ensemble(rng, S=20, member_scale=0.4)
    ss = spread_skill_ratio(samples, gt)
    assert float(ss.mean()) < 0.6
    hist = rank_histogram(samples, gt)
    mid = hist[len(hist) // 2]
    assert hist[0] > 2 * mid and hist[-1] > 2 * mid  # ∪ shape


def test_reliability_index_worst_case():
    """All mass in one bin -> the documented maximum 2*S/(S+1)."""
    S = 20
    hist = np.zeros(S + 1, dtype=int)
    hist[0] = 12345
    assert np.isclose(reliability_index(hist), 2 * S / (S + 1))


def test_fair_crps_is_ensemble_size_unbiased():
    """E[fair CRPS] must not depend on S for members iid with the truth
    (Ferro 2014).  Compare S=4 vs S=64 over many replicates."""
    rng = np.random.default_rng(3)
    T, H, W = 64, 8, 8
    gt = rng.standard_normal((T, H, W))
    small = crps_ensemble(rng.standard_normal((4, T, H, W)), gt)
    large = crps_ensemble(rng.standard_normal((64, T, H, W)), gt)
    # both estimate the CRPS of the N(0,1) ideal predictor vs N(0,1) truth:
    # E|X-Y| - 0.5 E|X-X'| = 2/sqrt(pi) - 1/sqrt(pi) = 1/sqrt(pi)
    analytic = 1.0 / np.sqrt(np.pi)
    assert abs(float(small.mean()) - analytic) < 0.02
    assert abs(float(large.mean()) - analytic) < 0.02
    assert abs(float(small.mean()) - float(large.mean())) < 0.02
