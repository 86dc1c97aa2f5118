"""Metric implementations: sanity properties and closed-form checks."""

import numpy as np

from climate2weather_tpu.exp.metrics import (
    compute_wasserstein_nd,
    melr,
    rapsd,
    rapsd_over_time,
    sliced_wasserstein_distance,
    ssim2d,
    ssim_ensemble,
    upsample_observation,
)


def test_sliced_wasserstein_identity_and_shift():
    rng = np.random.RandomState(0)
    X = rng.randn(200, 16)
    assert sliced_wasserstein_distance(X, X) < 1e-9
    # mean shift by delta in every dim: SW2 = |delta| * E[|<u, 1>|^2]^(1/2) > 0
    Y = X + 1.0
    d = sliced_wasserstein_distance(X, Y)
    assert d > 0.5


def test_wasserstein_ensemble_shape():
    rng = np.random.RandomState(1)
    gt = rng.randn(6, 8, 8)
    samples = np.stack([gt + rng.randn(6, 8, 8) * s for s in (0.01, 0.5)])
    w = compute_wasserstein_nd(samples, gt)
    assert w.shape == (2,)
    assert w[0] < w[1]  # closer ensemble scores lower


def test_rapsd_sine_peak():
    # A pure sinusoid concentrates power at its wavenumber
    L = 64
    yy, xx = np.indices((L, L))
    k = 8
    field = np.sin(2 * np.pi * k * xx / L)
    psd, freq = rapsd(field, d=1.0, normalize=True)
    assert psd.shape == (L // 2,)
    assert np.argmax(psd) == k
    assert np.isclose(psd.sum(), 1.0)
    np.testing.assert_allclose(freq[1], 1.0 / L)


def test_rapsd_white_noise_flatish():
    rng = np.random.RandomState(0)
    psds = np.stack([rapsd(rng.randn(64, 64), normalize=False)[0] for _ in range(20)])
    m = psds.mean(0)[1:]
    assert m.max() / m.min() < 2.0  # flat spectrum up to annulus noise


def test_melr_zero_for_identical_spectra():
    rng = np.random.RandomState(0)
    gt = np.abs(rng.randn(5, 16)) + 0.1
    samples = np.stack([gt, gt * np.e])  # second: log ratio == 1 everywhere
    out = melr(samples, gt)
    np.testing.assert_allclose(out, [0.0, 1.0], atol=1e-12)
    w = melr(samples, gt, do_weighted=True)
    np.testing.assert_allclose(w, [0.0, 1.0], atol=1e-12)
    mx = melr(samples, gt, do_max=True)
    np.testing.assert_allclose(mx, [0.0, 1.0], atol=1e-12)


def test_ssim_identity_and_noise():
    rng = np.random.RandomState(0)
    a = rng.randn(32, 32)
    assert np.isclose(ssim2d(a, a, data_range=a.max() - a.min()), 1.0)
    noisy = a + rng.randn(32, 32)
    s = ssim2d(a, noisy, data_range=4.0)
    assert s < 0.9


def test_ssim_ensemble_ordering():
    rng = np.random.RandomState(1)
    gt = rng.randn(4, 32, 32)
    samples = np.stack([gt + 0.01 * rng.randn(4, 32, 32), gt + rng.randn(4, 32, 32)])
    s = ssim_ensemble(samples, gt)
    assert s.shape == (2,)
    assert s[0] > s[1]


def test_upsample_observation_constant_and_nearest():
    obs = np.full((2, 4, 4), 3.5)
    for method in ("nearest", "bilinear"):
        up = upsample_observation(obs, 16, 16, method=method)
        assert up.shape == (2, 16, 16)
        np.testing.assert_allclose(up, 3.5)
    blocks = np.arange(16, dtype=np.float64).reshape(1, 4, 4)
    up = upsample_observation(blocks, 8, 8, method="nearest")
    np.testing.assert_array_equal(up[0, :2, :2], 0.0)
    np.testing.assert_array_equal(up[0, -2:, -2:], 15.0)


def test_upsample_observation_inverts_avgpool_of_linear_ramp():
    # avg-pool of a linear ramp keeps block means on the ramp, so bilinear
    # upsampling through the aligned block centers reproduces the ramp
    # exactly in the interior (edges clamp).
    s = 4
    H = W = 32
    ramp = (
        np.arange(H)[:, None] * 0.7 + np.arange(W)[None, :] * -0.3
    )[None].astype(np.float64)
    coarse = ramp.reshape(1, H // s, s, W // s, s).mean(axis=(2, 4))
    up = upsample_observation(coarse, H, W, method="bilinear")
    inner = slice(s, -s)
    np.testing.assert_allclose(up[0, inner, inner], ramp[0, inner, inner],
                               atol=1e-10)


def test_interp_baseline_melr_exceeds_ensemble_melr():
    # A white-noise ground truth has energy at all wavenumbers; bilinear
    # upsampling of its 4x-pooled observation cannot carry the top 3/4 of
    # the spectrum, so the baseline's MELR must dwarf that of samples drawn
    # from the correct distribution.
    rng = np.random.RandomState(0)
    gt = rng.randn(3, 32, 32)
    samples = rng.randn(2, 3, 32, 32)  # same law as gt -> same expected RAPSD
    obs = gt.reshape(3, 8, 4, 8, 4).mean(axis=(2, 4))
    base = upsample_observation(obs, 32, 32)[None]
    r_s = rapsd_over_time(samples, gt)
    r_b = rapsd_over_time(base, gt)
    m_s = melr(r_s["sample_rapsd_over_time"], r_s["gt_rapsd_over_time"])
    m_b = melr(r_b["sample_rapsd_over_time"], r_b["gt_rapsd_over_time"])
    assert m_b.mean() > 3 * m_s.mean(), (m_b, m_s)


# ---------------------------------------------------------------------------
# calibration metrics


def test_pairwise_absdiff_sorted_identity_matches_bruteforce():
    from climate2weather_tpu.exp.metrics import _mean_pairwise_absdiff

    rng = np.random.RandomState(7)
    x = rng.randn(9, 5, 3)
    got = _mean_pairwise_absdiff(x)
    S = x.shape[0]
    brute = np.zeros(x.shape[1:])
    for i in range(S):
        for j in range(S):
            if i != j:
                brute += np.abs(x[i] - x[j])
    brute /= S * (S - 1)
    np.testing.assert_allclose(got, brute, rtol=1e-12)


def test_crps_gaussian_matches_closed_form():
    """Fair CRPS of a large N(0,1) ensemble vs the analytic Gaussian CRPS
    sigma * [z(2*Phi(z)-1) + 2*phi(z) - 1/sqrt(pi)]."""
    from math import erf, pi, sqrt

    from climate2weather_tpu.exp.metrics import crps_ensemble

    rng = np.random.RandomState(0)
    H = W = 48
    y = rng.uniform(-2.0, 2.0, size=(1, H, W))
    samples = rng.randn(512, 1, H, W)
    got = crps_ensemble(samples, y)[0]

    z = y[0]
    Phi = 0.5 * (1.0 + np.vectorize(erf)(z / sqrt(2.0)))
    phi = np.exp(-0.5 * z**2) / sqrt(2.0 * pi)
    analytic = (z * (2.0 * Phi - 1.0) + 2.0 * phi - 1.0 / sqrt(pi)).mean()
    np.testing.assert_allclose(got, analytic, rtol=0.02)


def test_crps_deterministic_degenerates_to_mae():
    from climate2weather_tpu.exp.metrics import crps_ensemble

    rng = np.random.RandomState(3)
    gt = rng.randn(4, 8, 8)
    fc = gt + rng.randn(4, 8, 8) * 0.5
    got = crps_ensemble(fc[None], gt)
    mae = np.abs(fc - gt).mean(axis=(1, 2))
    np.testing.assert_allclose(got, mae, rtol=1e-12)


def test_crps_rewards_sharp_correct_ensembles():
    from climate2weather_tpu.exp.metrics import crps_ensemble

    rng = np.random.RandomState(5)
    gt = np.zeros((2, 16, 16))
    tight = rng.randn(24, 2, 16, 16) * 0.1
    loose = rng.randn(24, 2, 16, 16) * 2.0
    assert crps_ensemble(tight, gt).mean() < crps_ensemble(loose, gt).mean()


def test_spread_skill_near_one_for_calibrated_ensemble():
    from climate2weather_tpu.exp.metrics import spread_skill_ratio

    rng = np.random.RandomState(11)
    S, T, H, W = 20, 3, 64, 64
    samples = rng.randn(S, T, H, W)
    gt = rng.randn(T, H, W)  # truth is one more exchangeable draw
    ratio = spread_skill_ratio(samples, gt)
    assert np.all(np.abs(ratio - 1.0) < 0.06), ratio
    # overconfident ensemble: spread shrinks, skill doesn't
    assert spread_skill_ratio(samples * 0.3, gt).mean() < 0.5


def test_rank_histogram_flat_iff_exchangeable():
    from climate2weather_tpu.exp.metrics import (
        rank_histogram,
        reliability_index,
    )

    rng = np.random.RandomState(2)
    S, T, H, W = 10, 2, 64, 64
    samples = rng.randn(S, T, H, W)
    gt = rng.randn(T, H, W)
    hist = rank_histogram(samples, gt)
    assert hist.shape == (S + 1,)
    assert hist.sum() == T * H * W
    assert reliability_index(hist) < 0.08
    # biased truth piles up in the top rank
    hist_biased = rank_histogram(samples, gt + 4.0)
    assert hist_biased[-1] > 0.95 * hist_biased.sum()
    assert reliability_index(hist_biased) > 1.0
