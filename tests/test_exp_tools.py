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
