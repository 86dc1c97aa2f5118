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


def test_mesoscale_spectrum():
    """The 'mesoscale' family must produce the realistic atmospheric shape:
    ring-averaged RAPSD tails near k^-8/3 (= integrated k^-5/3) for winds and
    temperature, and an ageostrophic pressure component that keeps the psl
    tail resolvable (the property MELR evaluation depends on)."""
    ds = synthesize_cosmo_like(24, res=64, seed=3, spectrum="mesoscale")
    f = np.arange(1, 33)
    for var in ("uas", "vas", "tas"):
        psd = _mean_rapsd(ds.data_vars[var][::6])
        tail = np.polyfit(np.log(f[12:30]), np.log(psd[12:30] + 1e-300), 1)[0]
        assert -3.4 < tail < -2.0, (var, tail)

    # ageostrophic perturbations own the psl tail: switching them off must
    # drop the high-wavenumber power by a large factor (crossover is near
    # ring 16 in cycles/domain, so measure at res=128 where the tail rings
    # sit well beyond it)
    ds1 = synthesize_cosmo_like(24, res=128, seed=3, spectrum="mesoscale")
    ds0 = synthesize_cosmo_like(
        24, res=128, seed=3, spectrum="mesoscale", psl_ageo_std=0.0
    )
    p_on = _mean_rapsd(ds1.data_vars["psl"][::6])
    p_off = _mean_rapsd(ds0.data_vars["psl"][::6])
    assert np.median(p_on[48:63] / (p_off[48:63] + 1e-300)) > 3.0

    # physical invariants hold in the new family too
    assert 95000 < ds.data_vars["psl"].mean() < 107000
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
