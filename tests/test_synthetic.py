"""Synthetic COSMO-like generator: the statistics the fidelity run depends on
(power-law RAPSD, temporal coherence, diurnal cycle, realistic magnitudes,
divergence-free winds) must actually hold."""

import numpy as np

from climate2weather_tpu.data.synthetic import synthesize_cosmo_like
from climate2weather_tpu.exp.metrics import rapsd


def _mean_rapsd(fields):
    return np.mean([rapsd(f)[0] for f in fields], axis=0)


def test_synthetic_statistics():
    ds = synthesize_cosmo_like(96, res=64, seed=3)
    assert sorted(ds.data_vars) == ["psl", "tas", "uas", "vas"]
    assert ds.data_vars["psl"].shape == (96, 64, 64)
    assert len(ds.time) == 96 and str(ds.time.dtype).startswith("datetime64")

    # magnitudes in realistic ranges
    psl, tas = ds.data_vars["psl"], ds.data_vars["tas"]
    assert 95000 < psl.mean() < 107000 and 200 < psl.std() < 3000
    assert 250 < tas.mean() < 310
    assert ds.data_vars["uas"].std() < 15

    # power-law spectra: fit log-log slope over mid wavenumbers
    for var, lo, hi in [("psl", -7.0, -4.0), ("uas", -4.5, -2.0)]:
        psd = _mean_rapsd(ds.data_vars[var][::12])
        f = np.arange(1, len(psd) + 1)
        slope = np.polyfit(np.log(f[3:24]), np.log(psd[3:24] + 1e-300), 1)[0]
        assert lo < slope < hi, (var, slope)

    # temporal coherence: fields decorrelate smoothly, not white noise
    u = ds.data_vars["uas"].reshape(96, -1)
    u = u - u.mean(axis=0)
    lag1 = np.mean(
        np.sum(u[:-1] * u[1:], axis=0)
        / np.sqrt(np.sum(u[:-1] ** 2, axis=0) * np.sum(u[1:] ** 2, axis=0) + 1e-12)
    )
    assert 0.5 < lag1 < 0.999, lag1

    # diurnal cycle in tas: domain-mean 24h harmonic is present
    m = tas.mean(axis=(1, 2))
    h = np.arange(96)
    amp = np.abs(np.sum(m * np.exp(-2j * np.pi * h / 24.0))) / 48
    assert amp > 0.5, amp

    # winds are (numerically) divergence-free: du/dx + dv/dy ~ 0
    uas, vas = ds.data_vars["uas"][0], ds.data_vars["vas"][0]
    div = np.gradient(uas, axis=1) + np.gradient(vas, axis=0)
    rel = np.abs(div).mean() / (np.abs(np.gradient(uas, axis=1)).mean() + 1e-12)
    assert rel < 0.5, rel


def test_synthetic_deterministic_and_distinct_seeds():
    a = synthesize_cosmo_like(8, res=32, seed=7)
    b = synthesize_cosmo_like(8, res=32, seed=7)
    c = synthesize_cosmo_like(8, res=32, seed=8)
    np.testing.assert_array_equal(a.data_vars["psl"], b.data_vars["psl"])
    assert not np.allclose(a.data_vars["psl"], c.data_vars["psl"])
