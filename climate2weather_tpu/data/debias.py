"""Quantile-mapping bias correction for climate-model inputs.

The reference's year-downscaling experiments condition on either raw
("biased") or quantile-mapping-debiased CMIP6 fields
(exp/configs/001_clim-downscaling/qm_debiased_*.yml; the debiasing itself
was done outside the reference repo).  This module provides the standard
empirical QM so the full workflow is self-contained: per variable, map each
value through the climate model's empirical CDF onto the reanalysis
reference's quantile function, estimated over the calibration period.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from climate2weather_tpu.data.grid import GridDataset


def fit_quantile_mapping(
    model_ds: GridDataset,
    reference_ds: GridDataset,
    n_quantiles: int = 199,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Per-variable empirical transfer functions model -> reference.

    Quantiles are estimated over all of (time, rlat, rlon) for both
    datasets (consistent with the scalar-quantile normalization used
    throughout, reference data/xarray_preproc.py:5-13).
    """
    qs = (np.arange(1, n_quantiles + 1)) / (n_quantiles + 1)
    mapping = {}
    for var in sorted(model_ds.data_vars):
        assert var in reference_ds.data_vars, var
        src_q = np.quantile(model_ds.data_vars[var].astype(np.float64), qs)
        ref_q = np.quantile(reference_ds.data_vars[var].astype(np.float64), qs)
        mapping[var] = {"quantiles": qs, "src": src_q, "ref": ref_q}
    return mapping


def apply_quantile_mapping(
    ds: GridDataset, mapping: Dict[str, Dict[str, np.ndarray]]
) -> GridDataset:
    """Map values through the fitted transfer functions (linear
    interpolation between quantile anchors; linear tail extension)."""

    def transform(var: str, values: np.ndarray) -> np.ndarray:
        m = mapping[var]
        src, ref = m["src"], m["ref"]
        out = np.interp(values, src, ref)
        # linear extension beyond the fitted range (np.interp clamps)
        lo_slope = (ref[1] - ref[0]) / max(src[1] - src[0], 1e-12)
        hi_slope = (ref[-1] - ref[-2]) / max(src[-1] - src[-2], 1e-12)
        below = values < src[0]
        above = values > src[-1]
        out = np.where(below, ref[0] + (values - src[0]) * lo_slope, out)
        out = np.where(above, ref[-1] + (values - src[-1]) * hi_slope, out)
        return out.astype(np.float32)

    return ds.map(lambda k, v: transform(k, v) if k in mapping else v)


def debias(
    model_ds: GridDataset,
    reference_ds: GridDataset,
    target_ds: GridDataset = None,
    n_quantiles: int = 199,
) -> GridDataset:
    """Fit on (model_ds, reference_ds) over a calibration period and apply
    to ``target_ds`` (defaults to model_ds)."""
    mapping = fit_quantile_mapping(model_ds, reference_ds, n_quantiles)
    return apply_quantile_mapping(
        target_ds if target_ds is not None else model_ds, mapping
    )
