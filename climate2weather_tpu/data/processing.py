"""Offline data engineering: patch extraction, quantiles, normalized HDF5 build.

Capability parity with the reference L0 layer (SURVEY.md §2.2):

- ``extract_patch`` — slice the study region out of full-domain files using
  stored index ranges, with NaN detection + temporal interpolation fallback
  (reference data/processing.py:60-156; production region is rows
  [344, 472) x cols [371, 499), a 128x128 patch).
- ``compute_quantiles`` — 9 quantiles (0 .. 1) over (time, rlat, rlon)
  (reference data/xarray_preproc.py:5-13).
- ``mean_climatology`` — per-timestamp-of-year mean broadcast helper
  (reference data/xarray_preproc.py:16-28).
- ``merged_to_normed_h5`` — day-chunked streaming normalize -> resizable
  HDF5 dataset "x" [T, C, H, W] float32 with vars/norm_mode metadata and a
  hard NaN abort (reference data/processing.py:178-246).

The reference additionally drives the external ``cdo`` binary for mergetime /
seldate / merge (data/cdo_preproc.sh); those operations are implemented
natively here (``merge_time``, ``select_dates``, ``merge_vars``) so the
pipeline has no binary dependency.
"""

from __future__ import annotations

import os
from datetime import timedelta
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from climate2weather_tpu.data.grid import (
    GridDataset,
    QuantileDataset,
    convert_to_datetime,
    open_grid,
)
from climate2weather_tpu.data.pipeline import normalize_ds

DEFAULT_PATCH = dict(lat_range=(344, 472), lon_range=(371, 499))


def extract_patch(
    ds: GridDataset,
    lat_range: Tuple[int, int] = DEFAULT_PATCH["lat_range"],
    lon_range: Tuple[int, int] = DEFAULT_PATCH["lon_range"],
    interpolate_nans: bool = True,
    audit_path: Optional[str] = None,
) -> GridDataset:
    """Slice the study patch by index ranges; pchip-interpolate NaN times.

    Reference: full_cosmo_to_interpolated_patch (data/processing.py:60-156)
    with the index ranges stored in COSMO_patch_index-ranges.npz.

    When NaNs are found and ``audit_path`` is set (a path stem, e.g. the
    output file without extension), the audit artifacts the reference writes
    (data/processing.py:124-150) are produced: ``<stem>_with_missing.h5``
    (the pre-interpolation patch), ``<stem>_nan_stats.npz`` (per-variable
    NaN time counts/indices).  Interpolation is always re-verified; NaNs
    surviving it are a hard failure, matching the reference's give-up path.
    """
    la0, la1 = lat_range
    lo0, lo1 = lon_range
    dv = {k: v[:, la0:la1, lo0:lo1] for k, v in ds.data_vars.items()}
    coords = {
        "time": ds.time,
        "rlat": ds.rlat[la0:la1],
        "rlon": ds.rlon[lo0:lo1],
    }
    patch = GridDataset(dv, coords, dict(ds.attrs))
    report = patch.nan_report()
    if report is not None:
        if not interpolate_nans:
            raise RuntimeError(f"NaNs in patch: {report}")
        if audit_path:
            patch.to_file(f"{audit_path}_with_missing.h5")
            stats = {}
            for k, r in report.items():
                stats[f"{k}_nr_of_times"] = np.asarray(r["nr_of_times"])
                stats[f"{k}_which_times"] = np.asarray(r["which_times"])
            np.savez(f"{audit_path}_nan_stats.npz", **stats)
            print(
                f"NaN audit written: {audit_path}_with_missing.h5, "
                f"{audit_path}_nan_stats.npz"
            )
        patch = _interpolate_nan_times(patch, report)
        remaining = patch.nan_report()
        if remaining is not None:
            # the reference "gives up" here (data/processing.py:149-150);
            # surface it as a hard error rather than a print
            raise RuntimeError(
                f"NaNs survived pchip interpolation — giving up: {remaining}"
            )
    return patch


def _interpolate_nan_times(ds: GridDataset, report: dict) -> GridDataset:
    """Replace fully/partially-NaN time steps via monotone cubic (PCHIP)
    interpolation along time, per pixel (reference data/processing.py:124-150)."""
    from scipy.interpolate import PchipInterpolator

    out = {}
    t_axis = np.arange(len(ds.time), dtype=np.float64)
    for k, v in ds.data_vars.items():
        if k not in report:
            out[k] = v
            continue
        bad_times = report[k]["which_times"]
        good = np.setdiff1d(t_axis.astype(int), bad_times)
        flat = v.reshape(len(t_axis), -1)
        interp = PchipInterpolator(t_axis[good], flat[good], axis=0)
        fixed = flat.copy()
        fixed[bad_times] = interp(t_axis[bad_times])
        out[k] = fixed.reshape(v.shape)
        print(f"Interpolated {len(bad_times)} NaN time steps for {k}")
    return GridDataset(out, dict(ds.coords), dict(ds.attrs))


_RAW_FILE_RE = None  # compiled lazily (module imports stay cheap)


def filter_files_by_years(file_list, start_year: int, end_year: int):
    """Keep raw archive files whose 12-digit start timestamp falls in
    [start_year, end_year] (reference data/processing.py:16-35; filenames
    like ``psl_EUR-6km_..._COSMO_v1_200601010000-200612312300.nc``).
    Non-matching filenames are a hard error, as in the reference."""
    import re

    global _RAW_FILE_RE
    if _RAW_FILE_RE is None:
        _RAW_FILE_RE = re.compile(r"^.+_(?P<start_time>\d{12})-.+\.nc$")
    out = []
    for f in file_list:
        m = _RAW_FILE_RE.match(f.name)
        if not m:
            raise ValueError(
                f"File name '{f.name}' does not match the required format"
            )
        if start_year <= int(m.group("start_time")[:4]) <= end_year:
            out.append(f)
    return out


def extract_patch_folder(
    var_folder: str,
    out_folder: str,
    years: Optional[str] = None,
    lat_range: Tuple[int, int] = DEFAULT_PATCH["lat_range"],
    lon_range: Tuple[int, int] = DEFAULT_PATCH["lon_range"],
) -> list:
    """Per-variable archive-folder extraction — the reference's actual L0
    entry point (data/processing.py full_cosmo_to_interpolated_patch,
    ``extract_patch --var-folder .../COSMO/psl --out-folder ... --years
    2006-2019``): glob the variable folder's raw netCDF files in sorted
    order, optionally filter by the filename's start year, slice each to
    the study patch (NaN audit + pchip fallback per file), and write each
    patch under the SAME filename in the output folder, ready for the
    mergetime/split/quantile pipeline (``preproc-all``).
    """
    import pathlib

    var_folder = pathlib.Path(var_folder)
    assert var_folder.is_dir(), f"{var_folder} is not a directory."
    out = pathlib.Path(out_folder)
    out.mkdir(parents=True, exist_ok=True)

    files = sorted(var_folder.glob("*.nc"))
    if not files:
        raise ValueError(
            f"No netCDF files found in {var_folder}. This runs per variable."
        )
    if years is not None:
        y0, y1 = map(int, str(years).split("-"))
        files = filter_files_by_years(files, y0, y1)
        if not files:
            raise ValueError(f"No files in {var_folder} match years {years}")

    written = []
    for f in files:
        dst = out / f.name
        patch = extract_patch(
            open_grid(str(f)),
            lat_range,
            lon_range,
            interpolate_nans=True,
            audit_path=str(dst.with_suffix("")),
        )
        patch.to_file(str(dst))
        written.append(dst)
        print(f"Wrote {dst}: {patch.sizes}")
    return written


# ---------------------------------------------------------------------------
# cdo-equivalent operations (mergetime / seldate / merge)


def merge_time(parts: Sequence[GridDataset]) -> GridDataset:
    """Concatenate along time in chronological order (cdo mergetime)."""
    parts = sorted(parts, key=lambda p: p.time[0])
    return GridDataset.concat_time(parts)


def select_dates(ds: GridDataset, start: str, end: str) -> GridDataset:
    """Inclusive date-range selection (cdo seldate)."""
    return ds.sel_time(convert_to_datetime(start), convert_to_datetime(end))


def merge_vars(datasets: Sequence[GridDataset]) -> GridDataset:
    """Merge single-variable datasets on identical coords (cdo merge)."""
    base = datasets[0]
    dv = {}
    for d in datasets:
        assert len(d.time) == len(base.time)
        dv.update(d.data_vars)
    return GridDataset(dv, dict(base.coords), dict(base.attrs))


# ---------------------------------------------------------------------------
# statistics


def compute_quantiles(
    ds: GridDataset,
    quantiles: Sequence[float] = (0.0, 0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0),
) -> QuantileDataset:
    """Scalar per-variable quantiles over all of (time, rlat, rlon)
    (reference data/xarray_preproc.py:5-13)."""
    qs = np.asarray(quantiles, np.float64)
    values = {
        k: np.quantile(v.astype(np.float64), qs) for k, v in ds.data_vars.items()
    }
    return QuantileDataset(qs, values)


def mean_climatology(ds: GridDataset) -> GridDataset:
    """Mean over years per (dayofyear, hour) slot, broadcast back to the
    original time axis (reference data/xarray_preproc.py:16-28)."""
    t = ds.time.astype("datetime64[s]")
    years = t.astype("datetime64[Y]").astype(int)
    doy = (t.astype("datetime64[D]") - t.astype("datetime64[Y]")).astype(int)
    hour = (t - t.astype("datetime64[D]")).astype("timedelta64[h]").astype(int)
    slot = doy * 24 + hour
    out = {}
    for k, v in ds.data_vars.items():
        sums: Dict[int, np.ndarray] = {}
        counts: Dict[int, int] = {}
        for i, s in enumerate(slot):
            if s not in sums:
                sums[s] = v[i].astype(np.float64).copy()
                counts[s] = 1
            else:
                sums[s] += v[i]
                counts[s] += 1
        clim = np.stack([sums[s] / counts[s] for s in slot]).astype(np.float32)
        out[k] = clim
    return GridDataset(out, dict(ds.coords), dict(ds.attrs))


# ---------------------------------------------------------------------------
# HDF5 training-file build


def merged_to_normed_h5(
    merged_path: str,
    quantile_path: str,
    out_path: str,
    norm_mode: str = "quant95",
    data_vars: Optional[Sequence[str]] = None,
    chunk_hours: int = 24,
) -> str:
    """Stream-normalize a merged grid file into the training HDF5 layout:
    resizable dataset "x" [T, C, H, W] float32 with ``vars`` and
    ``norm_mode`` attrs; hard-fails on NaN (reference data/processing.py:178-246).
    """
    import h5py

    ds = open_grid(merged_path, data_vars)
    data_vars = ds.var_names()
    normed = normalize_ds(ds, quantile_path, norm_mode)

    T = len(normed.time)
    H, W = len(normed.rlat), len(normed.rlon)
    C = len(data_vars)
    with h5py.File(out_path, "w") as f:
        x = f.create_dataset(
            "x",
            shape=(0, C, H, W),
            maxshape=(None, C, H, W),
            chunks=(min(chunk_hours, T), C, H, W),
            dtype=np.float32,
        )
        for t0 in range(0, T, chunk_hours):
            t1 = min(t0 + chunk_hours, T)
            block = np.stack(
                [normed.data_vars[v][t0:t1] for v in data_vars], axis=1
            ).astype(np.float32)
            if np.isnan(block).any():
                raise RuntimeError(f"NaN detected in normalized block [{t0}:{t1}]")
            x.resize(t1, axis=0)
            x[t0:t1] = block
        f.attrs["vars"] = data_vars
        f.attrs["norm_mode"] = norm_mode
    return out_path
