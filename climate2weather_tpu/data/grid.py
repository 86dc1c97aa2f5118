"""Lightweight labeled gridded datasets — the xarray-shaped state API.

The reference uses xarray + netCDF4 as its boundary between tensors and
georeferenced data (data/pipeline.py).  Neither is installed in this image,
so this module provides a dependency-free equivalent with the same
capability surface:

- :class:`GridDataset`: named data variables of shape [time, rlat, rlon]
  with coordinate arrays, time selection, spatial coarsening, HDF5/netCDF
  round-tripping.  netCDF4 files *are* HDF5, so reading ``.nc`` works via
  h5py with a minimal CF time decoder; when the real xarray/netCDF4 stack is
  importable it is used for writing ``.nc`` (gated import).
- :class:`QuantileDataset`: per-variable quantiles over (time, rlat, rlon),
  as produced by the preprocessing (reference data/xarray_preproc.py:5-13).

Everything here is host-side numpy; device code never touches it.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Dict, List, Optional, Sequence

import numpy as np

_NS = "datetime64[ns]"


def convert_to_datetime(date_str: str) -> datetime:
    """Parse 'YYYY-MM-DD-HH' or 'YYYY-MM-DD' (reference data/pipeline.py:37-43)."""
    try:
        return datetime.strptime(date_str, "%Y-%m-%d-%H")
    except ValueError:
        return datetime.strptime(date_str, "%Y-%m-%d")


def _decode_cf_time(values: np.ndarray, units: str) -> np.ndarray:
    """Minimal CF time decoding: '<unit> since <epoch>' -> datetime64[ns]."""
    m = re.match(
        r"(seconds|minutes|hours|days)\s+since\s+(.+)", units.strip(), re.I
    )
    if not m:
        raise ValueError(f"Unsupported CF time units: {units!r}")
    unit, epoch_s = m.group(1).lower(), m.group(2).strip()
    epoch_s = epoch_s.split("UTC")[0].strip().rstrip("Z").strip()
    for fmt in (
        "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M",
        "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d",
    ):
        try:
            epoch = datetime.strptime(epoch_s, fmt)
            break
        except ValueError:
            continue
    else:
        raise ValueError(f"Unparseable CF epoch: {epoch_s!r}")
    scale = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}[unit]
    base = np.datetime64(epoch, "ns")
    return base + (np.asarray(values, np.float64) * scale * 1e9).astype(
        "timedelta64[ns]"
    )


def _encode_cf_time(times: np.ndarray) -> tuple:
    times = np.asarray(times, _NS)
    epoch = times[0]
    hours = (times - epoch) / np.timedelta64(1, "h")
    epoch_dt = epoch.astype("datetime64[s]").item()
    return hours.astype(np.float64), f"hours since {epoch_dt.strftime('%Y-%m-%d %H:%M:%S')}"


@dataclass
class GridDataset:
    """Named [time, rlat, rlon] variables with coordinates."""

    data_vars: Dict[str, np.ndarray]
    coords: Dict[str, np.ndarray]
    attrs: Dict[str, object] = field(default_factory=dict)

    def __post_init__(self):
        t = len(self.coords["time"])
        y = len(self.coords["rlat"])
        x = len(self.coords["rlon"])
        for k, v in self.data_vars.items():
            assert v.shape == (t, y, x), (k, v.shape, (t, y, x))

    # -- introspection ------------------------------------------------------
    @property
    def time(self) -> np.ndarray:
        return self.coords["time"]

    @property
    def rlat(self) -> np.ndarray:
        return self.coords["rlat"]

    @property
    def rlon(self) -> np.ndarray:
        return self.coords["rlon"]

    @property
    def sizes(self) -> Dict[str, int]:
        return {
            "time": len(self.time),
            "rlat": len(self.rlat),
            "rlon": len(self.rlon),
        }

    def var_names(self) -> List[str]:
        return sorted(self.data_vars)

    # -- selection ----------------------------------------------------------
    def sel_time(self, start: datetime, end: datetime) -> "GridDataset":
        """Inclusive time slice (xarray ``sel(time=slice(...))`` semantics)."""
        t = self.time
        lo = np.datetime64(start, "ns")
        hi = np.datetime64(end, "ns")
        mask = (t >= lo) & (t <= hi)
        return self.isel_time(np.nonzero(mask)[0])

    def isel_time(self, idx) -> "GridDataset":
        idx = np.asarray(idx)
        return GridDataset(
            {k: v[idx] for k, v in self.data_vars.items()},
            {**self.coords, "time": self.time[idx]},
            dict(self.attrs),
        )

    def select_vars(self, names: Sequence[str]) -> "GridDataset":
        names = sorted(names)
        missing = set(names) - set(self.data_vars)
        assert not missing, f"missing variables: {missing}"
        return GridDataset(
            {k: self.data_vars[k] for k in names}, dict(self.coords), dict(self.attrs)
        )

    # -- transforms ---------------------------------------------------------
    def coarsen_mean(self, s: int) -> "GridDataset":
        """Block-mean coarsening over (rlat, rlon) by factor ``s``
        (xarray ``coarsen(rlat=s, rlon=s).mean()``)."""
        t, y, x = (
            len(self.time),
            len(self.rlat),
            len(self.rlon),
        )
        assert y % s == 0 and x % s == 0
        dv = {
            k: v.reshape(t, y // s, s, x // s, s).mean(axis=(2, 4))
            for k, v in self.data_vars.items()
        }
        coords = {
            "time": self.time,
            "rlat": self.rlat.reshape(y // s, s).mean(axis=1),
            "rlon": self.rlon.reshape(x // s, s).mean(axis=1),
        }
        return GridDataset(dv, coords, dict(self.attrs))

    def map(self, fn) -> "GridDataset":
        """Apply ``fn(name, values) -> values`` per variable."""
        return GridDataset(
            {k: fn(k, v) for k, v in self.data_vars.items()},
            dict(self.coords),
            dict(self.attrs),
        )

    def nan_report(self) -> Optional[dict]:
        """Times containing NaNs per variable (reference analyze_nan,
        data/pipeline.py:46-65); None when clean."""
        report = {}
        for k, v in self.data_vars.items():
            isnan = np.isnan(v)
            if isnan.any():
                which_times = np.unique(np.argwhere(isnan)[:, 0])
                report[k] = {
                    "nr_of_times": len(which_times),
                    "which_times": which_times,
                }
        return report or None

    # -- I/O ----------------------------------------------------------------
    def to_file(self, path: str, dtype: str = "float32") -> None:
        """Write an HDF5 file (readable back by :func:`open_grid`) with CF
        time metadata and HDF5 dimension scales attached, so netCDF-aware
        tools can recover named dimensions.  When the netCDF4 package is
        importable (it is not in the base image), a fully conformant netCDF4
        file is written instead.  Paths ending in ``.zarr`` write a zarr-v2
        directory store (data/zarr_store.py; readable by xarray.open_zarr)."""
        if str(path).rstrip("/").endswith(".zarr"):
            from climate2weather_tpu.data.zarr_store import write_zarr

            write_zarr(self, str(path), dtype)
            return
        try:
            import netCDF4  # type: ignore

            self._to_netcdf4(path, dtype)
            return
        except ImportError:
            pass
        import h5py

        hours, units = _encode_cf_time(self.time)
        with h5py.File(path, "w") as f:
            tds = f.create_dataset("time", data=hours)
            tds.attrs["units"] = units
            tds.attrs["standard_name"] = "time"
            rlat = f.create_dataset("rlat", data=np.asarray(self.rlat, np.float64))
            rlon = f.create_dataset("rlon", data=np.asarray(self.rlon, np.float64))
            for name, ds_ in (("time", tds), ("rlat", rlat), ("rlon", rlon)):
                ds_.make_scale(name)
            for k, v in self.data_vars.items():
                d = f.create_dataset(k, data=np.asarray(v, dtype))
                d.attrs["dims"] = ["time", "rlat", "rlon"]
                d.dims[0].attach_scale(tds)
                d.dims[1].attach_scale(rlat)
                d.dims[2].attach_scale(rlon)
            f.attrs["grid_attrs"] = json.dumps(self.attrs, default=str)

    def _to_netcdf4(self, path: str, dtype: str) -> None:
        import netCDF4  # type: ignore

        hours, units = _encode_cf_time(self.time)
        with netCDF4.Dataset(path, "w") as nc:
            nc.createDimension("time", len(self.time))
            nc.createDimension("rlat", len(self.rlat))
            nc.createDimension("rlon", len(self.rlon))
            tv = nc.createVariable("time", "f8", ("time",))
            tv[:] = hours
            tv.units = units
            nc.createVariable("rlat", "f8", ("rlat",))[:] = self.rlat
            nc.createVariable("rlon", "f8", ("rlon",))[:] = self.rlon
            for k, v in self.data_vars.items():
                nc.createVariable(k, dtype[0] + "4", ("time", "rlat", "rlon"))[
                    :
                ] = v

    @staticmethod
    def concat_time(parts: Sequence["GridDataset"]) -> "GridDataset":
        names = parts[0].var_names()
        return GridDataset(
            {k: np.concatenate([p.data_vars[k] for p in parts], axis=0) for k in names},
            {
                **parts[0].coords,
                "time": np.concatenate([p.time for p in parts]),
            },
            dict(parts[0].attrs),
        )


def open_grid(path: str, data_vars: Optional[Sequence[str]] = None) -> GridDataset:
    """Open an HDF5/netCDF4 gridded file into a :class:`GridDataset`.

    Handles files written by :meth:`GridDataset.to_file`, standard
    CF/netCDF4 files (the reference's merged-allvars.nc layout: per-variable
    [time, rlat, rlon] datasets plus coordinate variables), and zarr-v2
    directory stores.

    Zarr limitation: the dependency-free reader supports zlib-compressed or
    uncompressed chunks only (no blosc, the external-writer default), C
    order, no filter pipelines.  A missing ``time`` coordinate falls back to
    an index axis, like rlat/rlon.
    """
    from climate2weather_tpu.data.zarr_store import is_zarr, read_zarr

    if is_zarr(path):
        return read_zarr(path, data_vars)
    import h5py

    with h5py.File(path, "r") as f:
        keys = list(f.keys())
        coord_names = {"time", "rlat", "rlon", "lat", "lon", "rotated_pole"}
        if data_vars is None:
            data_vars = [
                k
                for k in keys
                if k not in coord_names
                and isinstance(f[k], h5py.Dataset)
                and f[k].ndim == 3
            ]
        tvals = f["time"][:]
        units = f["time"].attrs.get("units", b"")
        if isinstance(units, bytes):
            units = units.decode()
        time = _decode_cf_time(tvals, units) if units else np.asarray(tvals, _NS)
        coords = {
            "time": time,
            "rlat": np.asarray(f["rlat"][:], np.float64)
            if "rlat" in f
            else np.arange(f[data_vars[0]].shape[1], dtype=np.float64),
            "rlon": np.asarray(f["rlon"][:], np.float64)
            if "rlon" in f
            else np.arange(f[data_vars[0]].shape[2], dtype=np.float64),
        }
        dv = {}
        for k in sorted(data_vars):
            arr = np.asarray(f[k][:], np.float32)
            # apply CF packing/fill if present
            fill = f[k].attrs.get("_FillValue")
            if fill is not None:
                arr = np.where(arr == np.float32(fill), np.nan, arr)
            dv[k] = arr
        attrs = {}
        raw_attrs = f.attrs.get("grid_attrs")
        if raw_attrs is not None:
            attrs = json.loads(
                raw_attrs.decode() if isinstance(raw_attrs, bytes) else raw_attrs
            )
    return GridDataset(dv, coords, attrs)


@dataclass
class QuantileDataset:
    """Per-variable scalar quantiles over (time, rlat, rlon)."""

    quantiles: np.ndarray  # [nq] quantile levels
    values: Dict[str, np.ndarray]  # var -> [nq]

    def sel(self, q: float) -> Dict[str, float]:
        i = int(np.argmin(np.abs(self.quantiles - q)))
        assert np.isclose(self.quantiles[i], q), (q, self.quantiles)
        return {k: float(v[i]) for k, v in self.values.items()}

    def to_file(self, path: str) -> None:
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset("quantile", data=np.asarray(self.quantiles, np.float64))
            for k, v in self.values.items():
                f.create_dataset(k, data=np.asarray(v, np.float64))

    @staticmethod
    def from_file(path: str) -> "QuantileDataset":
        import h5py

        with h5py.File(path, "r") as f:
            qs = np.asarray(f["quantile"][:], np.float64)
            values = {}
            for k in f.keys():
                if k == "quantile":
                    continue
                arr = np.asarray(f[k][:], np.float64)
                # standard CF quantile files may carry [nq] or [nq,1,1]
                values[k] = arr.reshape(len(qs))
        return QuantileDataset(qs, values)
