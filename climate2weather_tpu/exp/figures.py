"""Evaluation figures (matplotlib; cartopy map overlays gated on import).

Capability parity targets from the reference ``exp/figures.py`` (2077 lines,
paper-specific): distributional KDE/PMF comparisons (:23), time series
(:280), storm snapshot grids (:501), spectra.  The reference's cartopy
rotated-pole map rendering and windpower conversion live in
``plotting_util.py`` / ``windpower.py`` here.
"""

from __future__ import annotations

import os
import pathlib
from typing import List, Optional

import numpy as np

from climate2weather_tpu.data.grid import GridDataset
from climate2weather_tpu.exp import exputil
from climate2weather_tpu.exp.metrics import rapsd

VAR2NAME = {
    "psl": ("Sea-level pressure", "hPa"),
    "tas": ("2m temperature", "K"),
    "uas": ("10m U wind", "m/s"),
    "vas": ("10m V wind", "m/s"),
}


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _kde(vals: np.ndarray, grid: np.ndarray, max_points: int = 20000) -> np.ndarray:
    """Gaussian KDE evaluated on ``grid`` (scipy; deterministic subsample
    keeps the O(n*m) evaluation tractable on full ensembles)."""
    from scipy.stats import gaussian_kde

    vals = np.asarray(vals, np.float64).ravel()
    if vals.size > max_points:
        # ceil the stride so the subsample spans the full record instead of
        # a time-prefix (floor stride + [:max_points] truncates the tail)
        vals = vals[:: -(-vals.size // max_points)]
    if np.std(vals) < 1e-12:
        out = np.zeros_like(grid)
        out[np.argmin(np.abs(grid - vals.mean()))] = 1.0
        return out
    return gaussian_kde(vals)(grid)


def kde_and_pmf(samples: List[GridDataset], gt: GridDataset, out_dir: str) -> str:
    """Per-variable value distributions, ensemble vs ground truth: true
    Gaussian-KDE curves (top row) and log-scale PMF histograms capturing the
    tails (bottom row) — the reference's kde_and_pmf (exp/figures.py:23)."""
    plt = _plt()
    names = gt.var_names()
    fig, axes = plt.subplots(
        2, len(names), figsize=(4 * len(names), 5.5), squeeze=False
    )
    for col, v in enumerate(names):
        gt_vals = gt.data_vars[v].ravel()
        s_vals = np.concatenate([s.data_vars[v].ravel() for s in samples])
        lo = float(min(gt_vals.min(), s_vals.min()))
        hi = float(max(gt_vals.max(), s_vals.max()))
        # KDE row shows the distribution BULK: rare generation outliers can
        # stretch the raw range 10x and squash the curves to a spike, so the
        # grid spans the 0.1-99.9 percentile band; the log-PMF row below
        # keeps the full range and exposes the tails.
        klo = float(min(np.quantile(gt_vals, 1e-3), np.quantile(s_vals, 1e-3)))
        khi = float(max(np.quantile(gt_vals, 1 - 1e-3),
                        np.quantile(s_vals, 1 - 1e-3)))
        pad = 0.05 * (khi - klo) or 1.0
        grid = np.linspace(klo - pad, khi + pad, 256)
        ax = axes[0, col]
        ax.plot(grid, _kde(gt_vals, grid), "k-", lw=2, label="ground truth")
        ax.plot(grid, _kde(s_vals, grid), "C0-", lw=2, label="samples")
        for s in samples[:5]:  # per-member curves show ensemble spread
            ax.plot(grid, _kde(s.data_vars[v], grid), "C0-", lw=0.5, alpha=0.3)
        name, unit = VAR2NAME.get(v, (v, ""))
        ax.set_title(f"{name} [{unit}]")
        ax.set_ylabel("KDE density" if col == 0 else "")
        ax.legend(fontsize=7)
        # PMF: shared bins, log scale to expose tail behavior
        axp = axes[1, col]
        bins = np.linspace(lo, hi, 80)
        axp.hist(gt_vals, bins=bins, density=True, histtype="step",
                 color="k", lw=1.5, label="ground truth")
        axp.hist(s_vals, bins=bins, density=True, histtype="step",
                 color="C0", lw=1.5, label="samples")
        axp.set_yscale("log")
        axp.set_ylabel("PMF (log)" if col == 0 else "")
    fig.tight_layout()
    path = os.path.join(out_dir, "kde_and_pmf.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def timeseries(
    samples: List[GridDataset], gt: GridDataset, obs: GridDataset, out_dir: str
) -> str:
    """Spatial-mean time series with ensemble spread vs gt vs obs
    (reference exp/figures.py:280)."""
    plt = _plt()
    names = gt.var_names()
    fig, axes = plt.subplots(len(names), 1, figsize=(10, 2.5 * len(names)), sharex=True)
    t_gt = gt.time.astype("datetime64[s]")
    for ax, v in zip(np.atleast_1d(axes), names):
        ens = np.stack([s.data_vars[v].mean(axis=(1, 2)) for s in samples])
        ax.fill_between(
            t_gt[: ens.shape[1]],
            ens.min(0),
            ens.max(0),
            alpha=0.3,
            label="ensemble range",
        )
        ax.plot(t_gt[: ens.shape[1]], ens.mean(0), lw=1, label="ensemble mean")
        ax.plot(t_gt, gt.data_vars[v].mean(axis=(1, 2)), "k-", lw=1, label="gt")
        ax.plot(
            obs.time.astype("datetime64[s]"),
            obs.data_vars[v].mean(axis=(1, 2)),
            "r.",
            ms=4,
            label="obs",
        )
        name, unit = VAR2NAME.get(v, (v, ""))
        ax.set_ylabel(f"{name}\n[{unit}]")
    np.atleast_1d(axes)[0].legend(ncol=4, fontsize=8)
    fig.tight_layout()
    path = os.path.join(out_dir, "timeseries.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def storm_grid(
    samples: List[GridDataset],
    gt: GridDataset,
    obs: GridDataset,
    out_dir: str,
    var: str = "uas",
    n_times: int = 6,
) -> str:
    """Snapshot grid: obs / gt / first samples across selected times,
    rendered on the Mollweide-projected geographic grid like the
    reference's cartopy storm grids (exp/figures.py:501-668)."""
    from climate2weather_tpu.exp.plotting_util import plot_map

    plt = _plt()
    T = gt.sizes["time"]
    t_idx = np.linspace(0, T - 1, n_times).astype(int)
    rows = 2 + min(len(samples), 3)
    fig, axes = plt.subplots(rows, n_times, figsize=(2 * n_times, 2 * rows))
    vmin = gt.data_vars[var].min()
    vmax = gt.data_vars[var].max()
    obs_times = obs.time
    kw = dict(var=var, vmin=vmin, vmax=vmax, add_colorbar=False, title="")

    def panel(ax, field, rlat, rlon):
        plot_map(field, rlat=rlat, rlon=rlon, ax=ax, graticule=False, **kw)

    for j, ti in enumerate(t_idx):
        oi = int(np.argmin(np.abs(obs_times - gt.time[ti])))
        panel(axes[0, j], obs.data_vars[var][oi], obs.rlat, obs.rlon)
        panel(axes[1, j], gt.data_vars[var][ti], gt.rlat, gt.rlon)
        for r in range(rows - 2):
            panel(axes[2 + r, j], samples[r].data_vars[var][ti],
                  samples[r].rlat, samples[r].rlon)
        axes[0, j].set_title(str(gt.time[ti].astype("datetime64[h]")), fontsize=7)
    for ax in axes.ravel():
        ax.set_xticks([])
        ax.set_yticks([])
    labels = ["obs", "gt"] + [f"sample {r}" for r in range(rows - 2)]
    for r, lab in enumerate(labels):
        axes[r, 0].set_ylabel(lab)
    fig.tight_layout()
    path = os.path.join(out_dir, f"storm_grid_{var}.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def rapsd_figure(
    samples: List[GridDataset], gt: GridDataset, out_dir: str, d: float = 6.0,
    obs: Optional[GridDataset] = None,
) -> str:
    """Mean radially averaged power spectra: ensemble vs ground truth, plus
    the bilinear-interpolated coarse observation (the no-model baseline —
    its spectrum collapses above the obs Nyquist, which is exactly the band
    the diffusion ensemble must fill; see metrics.upsample_observation)."""
    from climate2weather_tpu.exp.metrics import upsample_observation

    plt = _plt()
    names = gt.var_names()
    fig, axes = plt.subplots(1, len(names), figsize=(4 * len(names), 3))
    T = gt.sizes["time"]
    H, W = next(iter(gt.data_vars.values())).shape[-2:]
    t_idx = np.linspace(0, T - 1, min(T, 16)).astype(int)
    for ax, v in zip(np.atleast_1d(axes), names):
        gt_psd = np.mean([rapsd(gt.data_vars[v][t], d=d)[0] for t in t_idx], axis=0)
        _, freq = rapsd(gt.data_vars[v][t_idx[0]], d=d)
        s_psd = np.mean(
            [
                rapsd(s.data_vars[v][t], d=d)[0]
                for s in samples[:4]
                for t in t_idx
            ],
            axis=0,
        )
        ax.loglog(freq[1:], gt_psd[1:], "k-", label="gt")
        ax.loglog(freq[1:], s_psd[1:], "C0-", label="samples")
        if obs is not None and v in obs.data_vars:
            o = np.asarray(obs.data_vars[v], np.float64)
            if (
                o.ndim == 3 and o.shape[1] and o.shape[2]
                and H % o.shape[1] == 0 and W % o.shape[2] == 0
                and (o.shape[1], o.shape[2]) != (H, W)
            ):
                # ≤16 evenly spaced frames, matching the gt/sample t_idx
                # protocol (and bounding the FFT work at year scale)
                o_idx = np.linspace(0, o.shape[0] - 1, min(o.shape[0], 16))
                up = upsample_observation(o[o_idx.astype(int)], H, W)
                b_psd = np.mean(
                    [rapsd(up[t], d=d)[0] for t in range(up.shape[0])], axis=0
                )
                ax.loglog(freq[1:], b_psd[1:], "C3--", label="interp. obs")
        ax.set_title(v)
        ax.set_xlabel("wavenumber [1/km]")
        ax.legend()
    fig.tight_layout()
    path = os.path.join(out_dir, "rapsd.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def calibration(
    samples: List[GridDataset], gt: GridDataset, out_dir: str,
    obs: Optional[GridDataset] = None,
) -> str:
    """Ensemble-calibration panel: rank histogram (top) and spread/skill
    ratio over comparison times (bottom), per variable.

    Visualizes the calibration metrics of exp/metrics.py (fair CRPS's
    companions): a reliable ensemble has a flat rank histogram and a
    spread/skill ratio of 1 (dashed lines).  Comparison happens on the
    observation time grid when an observation is present, matching the
    metrics protocol (reference exp/metrics.py:233-240)."""
    from climate2weather_tpu.exp.metrics import (
        _sel_times,
        rank_histogram,
        reliability_index,
        spread_skill_ratio,
    )

    plt = _plt()
    names = gt.var_names()
    if obs is not None:
        times = obs.time[np.isin(obs.time, gt.time)]
        gt_cmp = _sel_times(gt, times)
        samples_cmp = [_sel_times(s, times) for s in samples]
    else:
        gt_cmp, samples_cmp = gt, list(samples)

    fig, axes = plt.subplots(2, len(names), figsize=(3.2 * len(names), 5.4))
    axes = np.asarray(axes).reshape(2, -1)
    for j, v in enumerate(names):
        gt_np = np.asarray(gt_cmp.data_vars[v], np.float64)
        ens = np.stack(
            [np.asarray(s.data_vars[v], np.float64) for s in samples_cmp]
        )
        S = ens.shape[0]

        hist = rank_histogram(ens, gt_np)
        freq = hist / hist.sum()
        ax = axes[0, j]
        ax.bar(np.arange(S + 1), freq, color="C0", width=0.9)
        ax.axhline(1.0 / (S + 1), color="k", ls="--", lw=1)
        name, _ = VAR2NAME.get(v, (v, ""))
        ax.set_title(f"{name}  (RI={reliability_index(hist):.2f})", fontsize=9)
        ax.set_xlabel("rank of truth in ensemble", fontsize=8)
        if j == 0:
            ax.set_ylabel("frequency")

        ax2 = axes[1, j]
        if S >= 2:
            ratio = spread_skill_ratio(ens, gt_np)
            ax2.plot(np.arange(len(ratio)), ratio, "C0.-", ms=4, lw=1)
        ax2.axhline(1.0, color="k", ls="--", lw=1)
        ax2.set_xlabel("comparison time index", fontsize=8)
        if j == 0:
            ax2.set_ylabel("spread / skill")
    fig.tight_layout()
    path = os.path.join(out_dir, "calibration.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def windpowers(
    samples: List[GridDataset], gt: GridDataset, out_dir: str
) -> str:
    """Wind-power time series: ensemble vs ground truth through the turbine
    model (reference exp/figures.py:1288)."""
    from climate2weather_tpu.exp.windpower import windpower_timeseries

    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 3))
    t = gt.time.astype("datetime64[s]")
    ens = np.stack([windpower_timeseries(s) for s in samples]) / 1e6
    ax.fill_between(t[: ens.shape[1]], ens.min(0), ens.max(0), alpha=0.3,
                    label="ensemble range")
    ax.plot(t[: ens.shape[1]], ens.mean(0), lw=1, label="ensemble mean")
    ax.plot(t, windpower_timeseries(gt) / 1e6, "k-", lw=1, label="gt")
    ax.set_ylabel("mean turbine power [MW]")
    ax.legend(ncol=3, fontsize=8)
    fig.tight_layout()
    path = os.path.join(out_dir, "windpower.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def windpower_dist(
    samples: List[GridDataset], gt: GridDataset, out_dir: str
) -> str:
    """Wind-power capacity-factor distributions: KDE of the per-hour
    spatial-mean capacity factor plus a log-PMF over per-pixel hourly
    capacity factors, ensemble vs ground truth (reference
    exp/figures.py:1171-1330 wind-power analysis)."""
    from climate2weather_tpu.exp.windpower import capacity_factor, wind_power

    plt = _plt()
    fig, (ax_kde, ax_pmf) = plt.subplots(1, 2, figsize=(9, 3.2))

    def cf_fields(ds):
        return capacity_factor(wind_power(ds.data_vars["uas"], ds.data_vars["vas"]))

    gt_cf = cf_fields(gt)
    s_cf = [cf_fields(s) for s in samples]
    grid = np.linspace(0.0, 1.0, 256)
    ax_kde.plot(grid, _kde(gt_cf.mean(axis=(1, 2)), grid), "k-", lw=2,
                label="ground truth")
    ens_mean_cf = np.concatenate([c.mean(axis=(1, 2)) for c in s_cf])
    ax_kde.plot(grid, _kde(ens_mean_cf, grid), "C0-", lw=2, label="samples")
    for c in s_cf[:5]:
        ax_kde.plot(grid, _kde(c.mean(axis=(1, 2)), grid), "C0-", lw=0.5, alpha=0.3)
    ax_kde.set_xlabel("spatial-mean capacity factor")
    ax_kde.set_ylabel("KDE density")
    ax_kde.legend(fontsize=8)

    bins = np.linspace(0, 1, 60)
    ax_pmf.hist(gt_cf.ravel(), bins=bins, density=True, histtype="step",
                color="k", lw=1.5, label="ground truth")
    ax_pmf.hist(np.concatenate([c.ravel() for c in s_cf]), bins=bins,
                density=True, histtype="step", color="C0", lw=1.5,
                label="samples")
    ax_pmf.set_yscale("log")
    ax_pmf.set_xlabel("per-pixel capacity factor")
    ax_pmf.set_ylabel("PMF (log)")
    ax_pmf.legend(fontsize=8)
    fig.suptitle("E-115/3000 @ 100 m hub, 1/7 power-law from 10 m winds",
                 fontsize=9)
    fig.tight_layout()
    path = os.path.join(out_dir, "windpower_dist.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def climate_grid(
    samples: List[GridDataset],
    gt: GridDataset,
    obs: GridDataset,
    out_dir: str,
    var: str = "tas",
    n_times: int = 5,
) -> str:
    """Coarse climate input vs downscaled ensemble at observation times
    (reference exp/figures.py:669) — like storm_grid but organized around
    the observation grid, with the coarse field overlaid at matching
    color scale."""
    plt = _plt()
    To = obs.sizes["time"]
    t_idx = np.linspace(0, To - 1, min(n_times, To)).astype(int)
    nrows = 1 + min(len(samples), 3)
    fig, axes = plt.subplots(nrows, len(t_idx), figsize=(2.2 * len(t_idx), 2.2 * nrows))
    axes = np.atleast_2d(axes)
    vmin = float(np.nanmin(obs.data_vars[var]))
    vmax = float(np.nanmax(obs.data_vars[var]))
    gt_times = gt.time
    for j, oi in enumerate(t_idx):
        ti = int(np.argmin(np.abs(gt_times - obs.time[oi])))
        axes[0, j].imshow(obs.data_vars[var][oi], vmin=vmin, vmax=vmax)
        axes[0, j].set_title(str(obs.time[oi].astype("datetime64[h]")), fontsize=7)
        for r in range(nrows - 1):
            axes[1 + r, j].imshow(samples[r].data_vars[var][ti], vmin=vmin, vmax=vmax)
    for ax in axes.ravel():
        ax.set_xticks([])
        ax.set_yticks([])
    axes[0, 0].set_ylabel("climate input")
    for r in range(nrows - 1):
        axes[1 + r, 0].set_ylabel(f"sample {r}")
    fig.tight_layout()
    path = os.path.join(out_dir, f"climate_grid_{var}.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def big_grid(
    samples: List[GridDataset],
    gt: GridDataset,
    out_dir: str,
    n_times: int = 8,
) -> str:
    """All variables x time for one sample against ground truth
    (reference exp/figures.py:1797)."""
    plt = _plt()
    names = gt.var_names()
    T = gt.sizes["time"]
    t_idx = np.linspace(0, T - 1, min(n_times, T)).astype(int)
    nrows = 2 * len(names)
    fig, axes = plt.subplots(nrows, len(t_idx), figsize=(2 * len(t_idx), 2 * nrows))
    for vi, v in enumerate(names):
        vmin = float(np.nanmin(gt.data_vars[v]))
        vmax = float(np.nanmax(gt.data_vars[v]))
        for j, ti in enumerate(t_idx):
            axes[2 * vi, j].imshow(gt.data_vars[v][ti], vmin=vmin, vmax=vmax)
            axes[2 * vi + 1, j].imshow(samples[0].data_vars[v][ti], vmin=vmin, vmax=vmax)
        axes[2 * vi, 0].set_ylabel(f"{v} gt", fontsize=8)
        axes[2 * vi + 1, 0].set_ylabel(f"{v} sample", fontsize=8)
    for ax in axes.ravel():
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    path = os.path.join(out_dir, "big_grid.png")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def downscaled_clim_dist(
    exp_dirs: List[str], labels: List[str], out_dir: str
) -> str:
    """Per-variable value distributions of downscaled ensembles from
    multiple experiments (e.g. biased vs quantile-mapping-debiased CMIP6
    inputs) against the shared ground truth
    (reference exp/figures.py:871-906)."""
    plt = _plt()
    loaded = [exputil.setup(d) for d in exp_dirs]
    gt = loaded[0][1]
    names = gt.var_names()
    fig, axes = plt.subplots(1, len(names), figsize=(4 * len(names), 3))
    for ax, v in zip(np.atleast_1d(axes), names):
        gt_vals = gt.data_vars[v].ravel()
        lo, hi = gt_vals.min(), gt_vals.max()
        for (samples, _, _), label in zip(loaded, labels):
            s_vals = np.concatenate([s.data_vars[v].ravel() for s in samples])
            lo, hi = min(lo, s_vals.min()), max(hi, s_vals.max())
        pad = 0.05 * (hi - lo) or 1.0
        grid = np.linspace(lo - pad, hi + pad, 256)
        ax.plot(grid, _kde(gt_vals, grid), "k-", lw=2, label="ground truth")
        for (samples, _, _), label in zip(loaded, labels):
            s_vals = np.concatenate([s.data_vars[v].ravel() for s in samples])
            ax.plot(grid, _kde(s_vals, grid), lw=1.5, label=label)
        name, unit = VAR2NAME.get(v, (v, ""))
        ax.set_title(f"{name} [{unit}]")
        ax.legend(fontsize=7)
    fig.tight_layout()
    path = os.path.join(out_dir, "downscaled_clim_dist.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


KINDS = {
    "kde_and_pmf": lambda s, g, o, d: kde_and_pmf(s, g, d),
    "timeseries": timeseries,
    "storm_grid": storm_grid,
    "climate_grid": climate_grid,
    "big_grid": lambda s, g, o, d: big_grid(s, g, d),
    "rapsd": lambda s, g, o, d: rapsd_figure(s, g, d, obs=o),
    "calibration": lambda s, g, o, d: calibration(s, g, d, obs=o),
    "windpower": lambda s, g, o, d: windpowers(s, g, d),
    "windpower_dist": lambda s, g, o, d: windpower_dist(s, g, d),
}


def make(
    kind: str,
    exp_dir: str,
    out_dir: Optional[str] = None,
    compare: Optional[List[str]] = None,
) -> str:
    valid = sorted(KINDS) + ["downscaled_clim_dist"]
    assert kind in valid, f"Unknown figure kind {kind!r}; options: {valid}"
    out_dir = out_dir or str(pathlib.Path(exp_dir) / "figures")
    os.makedirs(out_dir, exist_ok=True)
    if kind == "downscaled_clim_dist":
        dirs = [exp_dir] + list(compare or [])
        labels = [pathlib.Path(d).name for d in dirs]
        path = downscaled_clim_dist(dirs, labels, out_dir)
    else:
        samples, gt, obs = exputil.setup(exp_dir)
        path = KINDS[kind](samples, gt, obs, out_dir)
    print(f"Saved {path}")
    return path
