"""Normalization and tensor<->grid conversion — the data compatibility surface.

Capability parity with the reference ``data/pipeline.py``:

- ``load_processed`` (reference :151-180): open a processed merged file,
  time-slice by (start_time, num_hours), keep only requested variables,
  optional NaN audit.
- ``normalize_ds`` / ``unnormalize_ds`` (reference :183-244): quantile-based
  (de)normalization with the 5 modes minmax / robust / robust95 / quant95 /
  quant99 (production: quant95).
- ``ds_to_sorted_np`` / ``np_to_ds`` (reference :247-272): conversions with
  **sorted-variable channel ordering**, "LCHW" or "CLHW".

These are host-side numpy ops on :class:`GridDataset`; shapes and channel
ordering are the contract consumed by training, sampling, and metrics.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Sequence, Union

import numpy as np

from climate2weather_tpu.data.grid import (
    GridDataset,
    QuantileDataset,
    convert_to_datetime,
    open_grid,
)

NORM_MODES = ("minmax", "robust", "robust95", "quant95", "quant99")


def load_processed(
    ds_path: str,
    data_vars: Sequence[str],
    start_time: str,
    num_hours: int,
    do_nan_check: bool = False,
) -> GridDataset:
    data_vars = sorted(data_vars)
    start_dt = convert_to_datetime(start_time)
    end_dt = start_dt + timedelta(hours=num_hours - 1)
    ds = open_grid(ds_path).select_vars(data_vars).sel_time(start_dt, end_dt)
    if do_nan_check:
        report = ds.nan_report()
        if report is not None:
            print(f"Found missing values in dataset: {report}")
            raise RuntimeError("Aborting")
    return ds


def _scale_offset(quantile_ds: QuantileDataset, mode: str):
    """Per-variable (offset, scale) such that normalized = (x - offset)/scale."""
    if mode == "minmax":
        lo = quantile_ds.sel(0.0)
        hi = quantile_ds.sel(1.0)
        return lo, {k: hi[k] - lo[k] for k in lo}
    if mode == "robust":
        med = quantile_ds.sel(0.5)
        q25, q75 = quantile_ds.sel(0.25), quantile_ds.sel(0.75)
        return med, {k: q75[k] - q25[k] for k in med}
    if mode == "robust95":
        med = quantile_ds.sel(0.5)
        q05, q95 = quantile_ds.sel(0.05), quantile_ds.sel(0.95)
        return med, {k: q95[k] - q05[k] for k in med}
    if mode == "quant95":
        q05, q95 = quantile_ds.sel(0.05), quantile_ds.sel(0.95)
        return q05, {k: q95[k] - q05[k] for k in q05}
    if mode == "quant99":
        q01, q99 = quantile_ds.sel(0.01), quantile_ds.sel(0.99)
        return q01, {k: q99[k] - q01[k] for k in q01}
    raise ValueError(f"Invalid mode: {mode}")


def normalize_ds(
    ds: Union[GridDataset, str],
    quantile_ds: Union[QuantileDataset, str],
    mode: str,
) -> GridDataset:
    if isinstance(quantile_ds, str):
        quantile_ds = QuantileDataset.from_file(quantile_ds)
    if isinstance(ds, str):
        ds = open_grid(ds)
    offset, scale = _scale_offset(quantile_ds, mode)
    return ds.map(lambda k, v: (v - offset[k]) / scale[k])


def unnormalize_ds(
    ds: Union[GridDataset, str],
    quantile_ds: Union[QuantileDataset, str],
    mode: str,
) -> GridDataset:
    if isinstance(quantile_ds, str):
        quantile_ds = QuantileDataset.from_file(quantile_ds)
    if isinstance(ds, str):
        ds = open_grid(ds)
    offset, scale = _scale_offset(quantile_ds, mode)
    return ds.map(lambda k, v: v * scale[k] + offset[k])


def ds_to_sorted_np(
    ds: GridDataset, data_vars: Sequence[str], ordering: str = "LCHW"
) -> np.ndarray:
    """Stack sorted variables into [L, C, H, W] (or [C, L, H, W])."""
    assert ordering in ("LCHW", "CLHW"), f"Invalid ordering: {ordering}"
    data_vars = sorted(data_vars)
    axis = 0 if ordering == "CLHW" else 1
    return np.stack([ds.data_vars[v] for v in data_vars], axis=axis)


def np_to_ds(
    np_arr: np.ndarray, reference_ds: GridDataset, data_vars: Sequence[str]
) -> GridDataset:
    """[L, C, H, W] array -> GridDataset with the reference's coords."""
    assert np_arr.shape[0] == len(reference_ds.time)
    assert np_arr.shape[1] == len(data_vars)
    assert np_arr.shape[2] == len(reference_ds.rlat)
    assert np_arr.shape[3] == len(reference_ds.rlon)
    data_vars = sorted(data_vars)
    return GridDataset(
        {v: np.asarray(np_arr[:, i]) for i, v in enumerate(data_vars)},
        dict(reference_ds.coords),
        dict(reference_ds.attrs),
    )


def nhwc_to_nchw(x: np.ndarray) -> np.ndarray:
    """[L, H, W, C] device layout -> [L, C, H, W] storage/metrics layout."""
    return np.ascontiguousarray(np.moveaxis(x, -1, 1))


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.moveaxis(x, 1, -1))
