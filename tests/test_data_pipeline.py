"""Grid dataset I/O, normalization round-trips, conversions, processing."""

import numpy as np
import pytest

from climate2weather_tpu.data.grid import GridDataset, QuantileDataset
from climate2weather_tpu.data.pipeline import (
    ds_to_sorted_np,
    load_processed,
    normalize_ds,
    np_to_ds,
    unnormalize_ds,
    NORM_MODES,
)
from climate2weather_tpu.data.processing import (
    compute_quantiles,
    extract_patch,
    merge_time,
    merge_vars,
    merged_to_normed_h5,
    select_dates,
)


def make_grid(t=48, y=8, x=8, seed=0, vars_=("psl", "tas", "uas", "vas")):
    rng = np.random.RandomState(seed)
    time = np.datetime64("2014-01-01T00", "ns") + np.arange(t) * np.timedelta64(
        1, "h"
    )
    return GridDataset(
        {v: (rng.randn(t, y, x) * (i + 1) + 10 * i).astype(np.float32)
         for i, v in enumerate(vars_)},
        {"time": time, "rlat": np.linspace(-2, 2, y), "rlon": np.linspace(0, 4, x)},
    )


def test_grid_file_roundtrip(tmp_path):
    ds = make_grid()
    path = str(tmp_path / "grid.nc")
    ds.to_file(path)
    back = load_processed(path, ["psl", "tas", "uas", "vas"], "2014-01-01-00", 48)
    assert back.sizes == ds.sizes
    for v in ds.var_names():
        np.testing.assert_allclose(back.data_vars[v], ds.data_vars[v], rtol=1e-6)
    np.testing.assert_array_equal(back.time, ds.time)


def test_time_slicing(tmp_path):
    ds = make_grid(t=48)
    path = str(tmp_path / "grid.nc")
    ds.to_file(path)
    sub = load_processed(path, ["tas"], "2014-01-01-06", 12)
    assert sub.sizes["time"] == 12
    assert sub.time[0] == np.datetime64("2014-01-01T06", "ns")
    assert list(sub.data_vars) == ["tas"]


@pytest.mark.parametrize("mode", NORM_MODES)
def test_normalize_roundtrip(mode):
    ds = make_grid()
    qd = compute_quantiles(ds)
    normed = normalize_ds(ds, qd, mode)
    back = unnormalize_ds(normed, qd, mode)
    for v in ds.var_names():
        np.testing.assert_allclose(back.data_vars[v], ds.data_vars[v], rtol=1e-4, atol=1e-4)


def test_quant95_definition():
    ds = make_grid()
    qd = compute_quantiles(ds)
    normed = normalize_ds(ds, qd, "quant95")
    v = "tas"
    lo = np.quantile(ds.data_vars[v].astype(np.float64), 0.05)
    hi = np.quantile(ds.data_vars[v].astype(np.float64), 0.95)
    want = (ds.data_vars[v] - lo) / (hi - lo)
    np.testing.assert_allclose(normed.data_vars[v], want, rtol=1e-5, atol=1e-5)


def test_quantile_file_roundtrip(tmp_path):
    qd = compute_quantiles(make_grid())
    path = str(tmp_path / "q.nc")
    qd.to_file(path)
    back = QuantileDataset.from_file(path)
    np.testing.assert_allclose(back.quantiles, qd.quantiles)
    for k in qd.values:
        np.testing.assert_allclose(back.values[k], qd.values[k])


def test_sorted_np_conversions():
    ds = make_grid()
    arr = ds_to_sorted_np(ds, ["tas", "psl"])  # sorted -> psl first
    assert arr.shape == (48, 2, 8, 8)
    np.testing.assert_array_equal(arr[:, 0], ds.data_vars["psl"])
    np.testing.assert_array_equal(arr[:, 1], ds.data_vars["tas"])
    arr2 = ds_to_sorted_np(ds, ["tas", "psl"], ordering="CLHW")
    assert arr2.shape == (2, 48, 8, 8)
    back = np_to_ds(arr, ds, ["psl", "tas"])
    np.testing.assert_array_equal(back.data_vars["psl"], ds.data_vars["psl"])


def test_coarsen_mean():
    ds = make_grid(y=8, x=8)
    c = ds.coarsen_mean(4)
    assert c.sizes["rlat"] == 2 and c.sizes["rlon"] == 2
    want = ds.data_vars["psl"].reshape(48, 2, 4, 2, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(c.data_vars["psl"], want, rtol=1e-6)


def test_extract_patch_and_nan_interp():
    ds = make_grid(t=24, y=16, x=16)
    ds.data_vars["tas"][5] = np.nan  # one fully-NaN time step
    patch = extract_patch(ds, lat_range=(2, 10), lon_range=(4, 12))
    assert patch.sizes["rlat"] == 8 and patch.sizes["rlon"] == 8
    assert patch.nan_report() is None  # interpolated away
    # untouched variable identical
    np.testing.assert_array_equal(
        patch.data_vars["psl"], ds.data_vars["psl"][:, 2:10, 4:12]
    )


def test_extract_patch_nan_audit_artifacts(tmp_path):
    """NaN audit artifacts match the reference (data/processing.py:124-150):
    *_with_missing (pre-interp data), *_nan_stats.npz, and a hard failure if
    NaNs survive interpolation."""
    from climate2weather_tpu.data.grid import open_grid

    ds = make_grid(t=24, y=16, x=16)
    ds.data_vars["tas"][5] = np.nan
    ds.data_vars["uas"][7] = np.nan
    stem = str(tmp_path / "patch")
    patch = extract_patch(
        ds, lat_range=(2, 10), lon_range=(4, 12), audit_path=stem
    )
    assert patch.nan_report() is None

    with_missing = open_grid(stem + "_with_missing.h5")
    assert np.isnan(with_missing.data_vars["tas"][5]).all()
    assert not np.isnan(with_missing.data_vars["tas"][4]).any()
    stats = np.load(stem + "_nan_stats.npz")
    assert int(stats["tas_nr_of_times"]) == 1
    np.testing.assert_array_equal(stats["tas_which_times"], [5])
    np.testing.assert_array_equal(stats["uas_which_times"], [7])

    # NaNs surviving interpolation (all times NaN) are a hard failure
    ds2 = make_grid(t=8, y=16, x=16)
    ds2.data_vars["tas"][:] = np.nan
    with pytest.raises((RuntimeError, ValueError)):
        extract_patch(ds2, lat_range=(2, 10), lon_range=(4, 12))


def test_cdo_equivalents():
    d1 = make_grid(t=24, seed=1)
    d2 = make_grid(t=24, seed=2)
    d2.coords["time"] = d2.time + np.timedelta64(24, "h")
    merged = merge_time([d2, d1])  # order-insensitive
    assert merged.sizes["time"] == 48
    assert merged.time[0] == d1.time[0]
    sel = select_dates(merged, "2014-01-01", "2014-01-01-23")
    assert sel.sizes["time"] == 24
    a = make_grid(vars_=("psl",))
    b = make_grid(vars_=("tas",), seed=3)
    mv = merge_vars([a, b])
    assert sorted(mv.data_vars) == ["psl", "tas"]


def test_merged_to_normed_h5(tmp_path):
    import h5py

    ds = make_grid()
    merged = str(tmp_path / "merged.nc")
    qpath = str(tmp_path / "q.nc")
    ds.to_file(merged)
    compute_quantiles(ds).to_file(qpath)
    out = merged_to_normed_h5(merged, qpath, str(tmp_path / "train.h5"))
    with h5py.File(out) as f:
        x = f["x"][:]
        assert x.shape == (48, 4, 8, 8)
        assert list(f.attrs["vars"]) == ["psl", "tas", "uas", "vas"]
        assert f.attrs["norm_mode"] == "quant95"
    # values match direct normalization (sorted var order)
    normed = normalize_ds(ds, qpath, "quant95")
    np.testing.assert_allclose(x[:, 0], normed.data_vars["psl"], rtol=1e-5, atol=1e-5)


def test_zarr_roundtrip(tmp_path):
    """GridDataset .zarr write/read round-trip (zarr-v2 directory store,
    xarray _ARRAY_DIMENSIONS layout; BASELINE.md xarray/zarr state API)."""
    import json

    from climate2weather_tpu.data.grid import GridDataset, open_grid

    rng = np.random.RandomState(0)
    t = 50  # not a multiple of the 24-frame chunk: exercises edge padding
    time = np.datetime64("2014-03-01T00", "ns") + np.arange(t) * np.timedelta64(1, "h")
    ds = GridDataset(
        {v: rng.randn(t, 8, 12).astype(np.float32) for v in ("psl", "tas")},
        {"time": time, "rlat": np.linspace(-1, 1, 8), "rlon": np.linspace(0, 2, 12)},
        {"source": "test"},
    )
    path = str(tmp_path / "store.zarr")
    ds.to_file(path)

    # spec-level checks: group marker, array metadata, xarray dims
    assert (tmp_path / "store.zarr" / ".zgroup").exists()
    meta = json.loads((tmp_path / "store.zarr" / "psl" / ".zarray").read_text())
    assert meta["zarr_format"] == 2 and meta["chunks"] == [24, 8, 12]
    attrs = json.loads((tmp_path / "store.zarr" / "psl" / ".zattrs").read_text())
    assert attrs["_ARRAY_DIMENSIONS"] == ["time", "rlat", "rlon"]

    back = open_grid(path)
    assert back.var_names() == ["psl", "tas"]
    np.testing.assert_array_equal(back.time, ds.time)
    np.testing.assert_allclose(back.rlat, ds.rlat)
    for v in ("psl", "tas"):
        np.testing.assert_array_equal(back.data_vars[v], ds.data_vars[v])
    assert back.attrs["source"] == "test"

    # var selection + uncompressed-store read
    sel = open_grid(path, data_vars=["tas"])
    assert sel.var_names() == ["tas"]
