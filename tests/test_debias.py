"""Quantile-mapping debiasing: distributional alignment properties."""

import numpy as np

from climate2weather_tpu.data.debias import debias, fit_quantile_mapping, apply_quantile_mapping
from climate2weather_tpu.data.grid import GridDataset


def mk(data, vars_=("tas",)):
    t = data.shape[0]
    return GridDataset(
        {v: data.astype(np.float32) for v in vars_},
        {
            "time": np.datetime64("2014-01-01", "ns")
            + np.arange(t) * np.timedelta64(1, "h"),
            "rlat": np.arange(data.shape[1], dtype=float),
            "rlon": np.arange(data.shape[2], dtype=float),
        },
    )


def test_qm_removes_bias_and_scale_error():
    rng = np.random.RandomState(0)
    ref = mk(rng.randn(200, 8, 8))
    biased = mk(rng.randn(200, 8, 8) * 2.0 + 3.0)  # wrong scale + offset
    fixed = debias(biased, ref)
    v = fixed.data_vars["tas"]
    assert abs(v.mean()) < 0.1, v.mean()
    assert abs(v.std() - 1.0) < 0.1, v.std()


def test_qm_identity_on_same_distribution():
    rng = np.random.RandomState(1)
    a = mk(rng.randn(500, 4, 4))
    out = debias(a, mk(rng.randn(500, 4, 4)))
    # same distribution -> near-identity transform
    diff = out.data_vars["tas"] - a.data_vars["tas"]
    assert np.abs(diff).mean() < 0.15


def test_qm_monotone_and_tail_extension():
    rng = np.random.RandomState(2)
    ref = mk(rng.randn(300, 4, 4))
    src = mk(rng.randn(300, 4, 4) * 0.5)
    mapping = fit_quantile_mapping(src, ref)
    # apply to values beyond the calibration range
    extreme = mk(np.full((1, 4, 4), 10.0))
    out = apply_quantile_mapping(extreme, mapping)
    assert np.all(np.isfinite(out.data_vars["tas"]))
    assert out.data_vars["tas"].min() > 2.0  # maps far into the ref tail
    grid = np.linspace(-3, 3, 50)
    mapped = np.interp(grid, mapping["tas"]["src"], mapping["tas"]["ref"])
    assert np.all(np.diff(mapped) >= 0)
