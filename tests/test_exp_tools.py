"""Windpower model, plotting composites, exputil loading."""

import numpy as np

from climate2weather_tpu.exp.plotting_util import (
    assign_overlapping_values,
    sandwich,
    var2name,
)
from climate2weather_tpu.exp.windpower import (
    capacity_factor,
    wind_power,
    wind_speed_at_hub,
)


def test_hub_height_extrapolation():
    # 1/7 power law: 10 m/s at 10 m -> 10 * 10^(1/7) ~= 13.9 m/s at 100 m
    got = wind_speed_at_hub(np.array([10.0]), np.array([0.0]))
    np.testing.assert_allclose(got, 10 * 10 ** (1 / 7), rtol=1e-6)


def test_power_curve_regions():
    # below cut-in -> 0; at rated wind -> 3 MW; above cut-out -> 0
    calm = wind_power(np.array([0.5]), np.array([0.0]))
    assert calm[0] < 5e4
    rated = wind_power(np.array([10.0]), np.array([0.0]))  # ~13.9 m/s at hub
    np.testing.assert_allclose(rated, 3e6, rtol=0.01)
    storm = wind_power(np.array([30.0]), np.array([0.0]))  # hub > 25 m/s
    assert storm[0] == 0.0
    assert capacity_factor(rated)[0] <= 1.0 + 1e-9


def test_power_monotone_below_rated():
    speeds = np.linspace(2, 8, 20)
    p = wind_power(speeds, np.zeros_like(speeds))
    assert np.all(np.diff(p) >= 0)


def test_overlay_and_sandwich():
    fine = np.zeros((16, 16))
    coarse = np.ones((2, 2))
    out = assign_overlapping_values(fine, coarse)
    assert out[:8, :8].mean() == 1.0 and out[8:, 8:].mean() == 0.0
    rgb = sandwich([np.random.rand(8, 8), np.random.rand(8, 8)])
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    assert "pressure" in var2name("psl")


def test_rotated_pole_transform():
    """Rotated (0,0) on the COSMO-REA6 grid must map to the geographic
    domain center (~18E, ~50.75N); pole at 90N must be the identity."""
    from climate2weather_tpu.exp.plotting_util import rotated_to_lonlat

    lon, lat = rotated_to_lonlat(np.array([0.0]), np.array([0.0]))
    np.testing.assert_allclose(lon, [[18.0]], atol=1e-6)
    np.testing.assert_allclose(lat, [[90.0 - 39.25]], atol=1e-6)
    # identity when the rotated pole IS the geographic pole (pole_lon=-180
    # cancels the +180 convention)
    lon, lat = rotated_to_lonlat(
        np.array([5.0, -3.0]), np.array([40.0, 50.0]),
        pole_lon=-180.0, pole_lat=90.0,
    )
    np.testing.assert_allclose(lon[0], [5.0, -3.0], atol=1e-6)
    np.testing.assert_allclose(lat[:, 0], [40.0, 50.0], atol=1e-6)
    # round-trip monotonicity over the COSMO patch extent
    lon, lat = rotated_to_lonlat(
        np.linspace(-4.22, 2.77, 8), np.linspace(-6.07, 0.92, 8)
    )
    assert np.all(np.diff(lon, axis=1) > 0) and np.all(np.diff(lat, axis=0) > 0)


def test_mollweide_projection():
    from climate2weather_tpu.exp.plotting_util import mollweide_xy

    x, y = mollweide_xy(np.array([0.0]), np.array([0.0]))
    np.testing.assert_allclose([x[0], y[0]], [0.0, 0.0], atol=1e-9)
    x, y = mollweide_xy(np.array([0.0]), np.array([90.0]))
    np.testing.assert_allclose(y[0], np.sqrt(2.0), atol=1e-6)
    # +180 wraps to the antimeridian (same meridian as -180): |x| = 2*sqrt(2)
    x, y = mollweide_xy(np.array([180.0]), np.array([0.0]))
    np.testing.assert_allclose(np.abs(x[0]), 2.0 * np.sqrt(2.0), atol=1e-6)


def test_kde_is_a_density():
    from climate2weather_tpu.exp.figures import _kde

    rng = np.random.RandomState(0)
    vals = rng.randn(5000)
    grid = np.linspace(-6, 6, 512)
    d = _kde(vals, grid)
    np.testing.assert_allclose(np.trapezoid(d, grid), 1.0, atol=0.02)
    # peak near 0 at approximately the standard normal density
    assert abs(grid[np.argmax(d)]) < 0.3
    np.testing.assert_allclose(d.max(), 1 / np.sqrt(2 * np.pi), rtol=0.15)


def test_calibration_figure_smoke(tmp_path):
    """calibration() renders rank-histogram + spread/skill panels from
    GridDatasets and writes calibration.png."""
    from climate2weather_tpu.data.grid import GridDataset
    from climate2weather_tpu.exp.figures import calibration

    rng = np.random.RandomState(0)
    T, H, W = 5, 16, 16
    time = np.datetime64("2014-01-01T00", "ns") + np.arange(T) * np.timedelta64(
        1, "h"
    )
    coords = {
        "time": time,
        "rlat": np.linspace(-1, 1, H),
        "rlon": np.linspace(-1, 1, W),
    }

    def mk(seed):
        r = np.random.RandomState(seed)
        return GridDataset(
            {v: r.randn(T, H, W).astype(np.float32) for v in ("uas", "vas")},
            dict(coords),
        )

    gt = mk(1)
    samples = [mk(s) for s in range(2, 6)]
    path = calibration(samples, gt, str(tmp_path))
    assert path.endswith("calibration.png")
    import os

    assert os.path.getsize(path) > 0
    # obs present: comparison restricted to the obs time grid
    obs = GridDataset(
        {v: np.asarray(gt.data_vars[v])[::2, ::4, ::4] for v in ("uas", "vas")},
        {"time": time[::2], "rlat": coords["rlat"][::4],
         "rlon": coords["rlon"][::4]},
    )
    assert calibration(samples, gt, str(tmp_path), obs=obs).endswith(
        "calibration.png"
    )


def test_progression_report_format(tmp_path):
    """progression_report tabulates per-checkpoint metrics pickles."""
    import pickle
    import sys

    sys.path.insert(0, "scripts")
    try:
        from progression_report import format_table, progression_rows
    finally:
        sys.path.pop(0)

    for kdata, w2 in ((1049, 50.0), (2097, 10.0)):
        d = tmp_path / f"{kdata:07d}" / "guided" / "001_config" / "metrics" / "run"
        d.mkdir(parents=True)
        m = {
            "wasserstein": {"uas": {"global": np.array([w2, w2])}},
            "ssim": {"uas": {"global": np.array([0.5])}},
        }
        with open(d / "metrics.pickle", "wb") as f:
            pickle.dump(m, f)

    rows = list(progression_rows(tmp_path))
    assert [k for k, _ in rows] == [1049, 2097]
    table = format_table(rows, ["w2", "ssim", "crps"])
    assert "1.05M" in table and "2.10M" in table
    assert "50.0" in table and "10.0" in table
    assert "crps" not in table  # absent metrics are skipped, not n/a rows
