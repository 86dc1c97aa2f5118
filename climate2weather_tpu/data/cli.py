"""Data-engineering CLI (reference: the fire CLIs of data/processing.py and
data/xarray_preproc.py plus the bash cdo_preproc.sh driver, implemented
natively — no cdo binary needed).

Usage:
    python -m climate2weather_tpu.data.cli extract-patch ...
    python -m climate2weather_tpu.data.cli quantiles ...
    python -m climate2weather_tpu.data.cli to-normed-h5 ...
    python -m climate2weather_tpu.data.cli preproc-all ...
"""

from __future__ import annotations

import os
import pathlib

import click

from climate2weather_tpu.data.grid import GridDataset, open_grid
from climate2weather_tpu.data import processing as proc


@click.group()
def cli():
    pass


@cli.command("extract-patch")
@click.option("--in-path", required=True, help="Full-domain grid file")
@click.option("--out-path", required=True)
@click.option("--lat0", default=proc.DEFAULT_PATCH["lat_range"][0], show_default=True)
@click.option("--lat1", default=proc.DEFAULT_PATCH["lat_range"][1], show_default=True)
@click.option("--lon0", default=proc.DEFAULT_PATCH["lon_range"][0], show_default=True)
@click.option("--lon1", default=proc.DEFAULT_PATCH["lon_range"][1], show_default=True)
@click.option("--no-interp", is_flag=True, help="Fail on NaN instead of interpolating")
@click.option(
    "--no-audit",
    is_flag=True,
    help="Skip the *_with_missing / *_nan_stats audit artifacts on NaN",
)
def extract_patch(in_path, out_path, lat0, lat1, lon0, lon1, no_interp, no_audit):
    """Slice the study patch by index ranges, interpolating NaN time steps
    (reference data/processing.py extract_patch); NaN occurrences write
    audit artifacts next to the output and interpolation is re-verified."""
    ds = open_grid(in_path)
    stem = os.path.splitext(out_path)[0]
    patch = proc.extract_patch(
        ds,
        (lat0, lat1),
        (lon0, lon1),
        interpolate_nans=not no_interp,
        audit_path=None if no_audit else stem,
    )
    patch.to_file(out_path)
    print(f"Wrote {out_path}: {patch.sizes}")


@cli.command("extract-patch-folder")
@click.option("--var-folder", required=True,
              help="Per-variable folder of raw archive netCDF files")
@click.option("--out-folder", required=True)
@click.option("--years", default=None,
              help="Inclusive start-year filter on filenames, e.g. 2006-2019")
@click.option("--lat0", default=proc.DEFAULT_PATCH["lat_range"][0], show_default=True)
@click.option("--lat1", default=proc.DEFAULT_PATCH["lat_range"][1], show_default=True)
@click.option("--lon0", default=proc.DEFAULT_PATCH["lon_range"][0], show_default=True)
@click.option("--lon1", default=proc.DEFAULT_PATCH["lon_range"][1], show_default=True)
def extract_patch_folder(var_folder, out_folder, years, lat0, lat1, lon0, lon1):
    """Extract the study patch from every raw file of one variable's archive
    folder — the reference's per-variable workflow (`extract_patch
    --var-folder /path/to/COSMO/var`, data/README.md step 1). Output files
    keep their archive names for the downstream preproc-all pipeline."""
    proc.extract_patch_folder(
        var_folder, out_folder, years, (lat0, lat1), (lon0, lon1)
    )


@cli.command("merge-time")
@click.option("--out-path", required=True)
@click.argument("in_paths", nargs=-1, required=True)
def merge_time_cmd(out_path, in_paths):
    """Concatenate files chronologically (cdo mergetime equivalent)."""
    parts = [open_grid(p) for p in in_paths]
    proc.merge_time(parts).to_file(out_path)
    print(f"Wrote {out_path}")


@cli.command("select-dates")
@click.option("--in-path", required=True)
@click.option("--out-path", required=True)
@click.option("--start", required=True, help="YYYY-MM-DD[-HH]")
@click.option("--end", required=True, help="YYYY-MM-DD[-HH]")
def select_dates_cmd(in_path, out_path, start, end):
    """Date-range split (cdo seldate equivalent; reference uses
    2006-2013 train / 2014-2018 test)."""
    proc.select_dates(open_grid(in_path), start, end).to_file(out_path)
    print(f"Wrote {out_path}")


@cli.command("merge-vars")
@click.option("--out-path", required=True)
@click.argument("in_paths", nargs=-1, required=True)
def merge_vars_cmd(out_path, in_paths):
    """Merge single-variable files (cdo merge equivalent)."""
    proc.merge_vars([open_grid(p) for p in in_paths]).to_file(out_path)
    print(f"Wrote {out_path}")


@cli.command("quantiles")
@click.option("--in-path", required=True)
@click.option("--out-path", required=True)
def quantiles(in_path, out_path):
    """9 quantiles over (time, rlat, rlon) per variable
    (reference data/xarray_preproc.py quantiles)."""
    qd = proc.compute_quantiles(open_grid(in_path))
    qd.to_file(out_path)
    print(f"Wrote {out_path}: {sorted(qd.values)}")


@cli.command("to-normed-h5")
@click.option("--merged-path", required=True)
@click.option("--quantile-path", required=True)
@click.option("--out-path", required=True)
@click.option("--norm-mode", default="quant95", show_default=True)
def to_normed_h5(merged_path, quantile_path, out_path, norm_mode):
    """Build the [T, C, H, W] float32 training HDF5
    (reference data/processing.py to_normed_h5)."""
    proc.merged_to_normed_h5(merged_path, quantile_path, out_path, norm_mode)
    print(f"Wrote {out_path}")


@cli.command("debias")
@click.option("--model-path", required=True, help="Biased climate-model file")
@click.option("--reference-path", required=True, help="Reanalysis reference file")
@click.option("--target-path", default=None,
              help="File to transform (default: model-path)")
@click.option("--out-path", required=True)
@click.option("--n-quantiles", default=199, show_default=True)
def debias_cmd(model_path, reference_path, target_path, out_path, n_quantiles):
    """Quantile-mapping bias correction of climate inputs (produces the
    'qm-debiased' conditioning files of the clim-downscaling experiments)."""
    from climate2weather_tpu.data.debias import debias

    model = open_grid(model_path)
    ref = open_grid(reference_path)
    target = open_grid(target_path) if target_path else None
    out = debias(model, ref, target, n_quantiles)
    out.to_file(out_path)
    print(f"Wrote {out_path}")


@cli.command("synth")
@click.option("--out-dir", required=True)
@click.option("--train-hours", default=8784, show_default=True)
@click.option("--eval-hours", default=1488, show_default=True)
@click.option("--res", default=128, show_default=True)
@click.option("--seed", default=0, show_default=True)
@click.option("--norm-mode", default="quant95", show_default=True)
@click.option("--spectrum", default="smooth", show_default=True,
              type=click.Choice(["smooth", "mesoscale"]),
              help="Spatial-spectrum family: 'mesoscale' is the realistic "
                   "k^-3 -> k^-5/3 atmospheric shape (use for spectral-"
                   "fidelity evaluation); 'smooth' is the original "
                   "hyper-smooth law.")
def synth_cmd(out_dir, train_hours, eval_hours, res, seed, norm_mode,
              spectrum):
    """Generate a synthetic COSMO-like workload (train h5 + quantiles +
    held-out eval grid) for production-scale fidelity runs."""
    from climate2weather_tpu.data.synthetic import build_synthetic_dataset

    build_synthetic_dataset(
        out_dir, train_hours=train_hours, eval_hours=eval_hours,
        res=res, seed=seed, norm_mode=norm_mode, spectrum=spectrum,
    )


@cli.command("preproc-all")
@click.option("--raw-dir", required=True,
              help="Directory with per-variable subdirs of grid files")
@click.option("--out-dir", required=True)
@click.option("--train-range", default="2006-01-01,2013-12-31", show_default=True)
@click.option("--test-range", default="2014-01-01,2018-12-31", show_default=True)
@click.option("--norm-mode", default="quant95", show_default=True)
def preproc_all(raw_dir, out_dir, train_range, test_range, norm_mode):
    """Full offline pipeline: mergetime per var -> train/test splits ->
    quantiles (train) -> merge vars -> normalized training h5
    (the reference's data/cdo_preproc.sh flow, natively)."""
    raw = pathlib.Path(raw_dir)
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    var_dirs = sorted(d for d in raw.iterdir() if d.is_dir())
    assert var_dirs, f"No per-variable subdirectories in {raw_dir}"

    splits = {"train": train_range.split(","), "test": test_range.split(",")}
    merged_by_split = {}
    for split, (start, end) in splits.items():
        per_var = []
        for vd in var_dirs:
            # skip the *_with_missing.h5 NaN-audit artifacts extract-patch
            # writes next to its outputs — they duplicate time steps and
            # are diagnostics, not data
            files = [
                f
                for f in sorted(vd.glob("*.nc")) + sorted(vd.glob("*.h5"))
                if not f.name.endswith("_with_missing.h5")
            ]
            merged = proc.merge_time([open_grid(str(f)) for f in files])
            per_var.append(proc.select_dates(merged, start, end))
        merged_by_split[split] = proc.merge_vars(per_var)
        path = out / f"{split}_merged-allvars.nc"
        merged_by_split[split].to_file(str(path))
        print(f"Wrote {path}")

    qd = proc.compute_quantiles(merged_by_split["train"])
    qpath = out / "train_quantiles.nc"
    qd.to_file(str(qpath))
    print(f"Wrote {qpath}")

    h5 = proc.merged_to_normed_h5(
        str(out / "train_merged-allvars.nc"), str(qpath),
        str(out / "train_normed.h5"), norm_mode,
    )
    print(f"Wrote {h5}")


if __name__ == "__main__":
    cli()
