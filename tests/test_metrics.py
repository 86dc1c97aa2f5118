"""Metric implementations: sanity properties and closed-form checks."""

import numpy as np

from climate2weather_tpu.exp.metrics import (
    compute_wasserstein_nd,
    melr,
    rapsd,
    sliced_wasserstein_distance,
    ssim2d,
    ssim_ensemble,
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
