"""Package a fidelity run (+ optional mid-training probes) into docs/fidelity/.

Copies FIDELITY.md and the guided-run figures into the repo (runs/ is
gitignored), and renders a training-progression spectra figure from the
rapsd caches of successive probe/final runs.

Usage:
    python scripts/package_fidelity.py FINAL_OUT_DIR \
        [--probe LABEL=OUT_DIR ...] [--dest docs/fidelity]
"""

from __future__ import annotations

import argparse
import pathlib
import shutil

import numpy as np


def _guided_dir(out_dir: pathlib.Path) -> pathlib.Path:
    cands = sorted((out_dir / "guided").glob("*config*"))
    assert cands, f"no guided experiment dir under {out_dir}"
    return cands[0]


def progression_figure(runs, dest: pathlib.Path, var: str = "uas") -> str:
    """Mean sample spectra across checkpoints vs ground truth for ``var``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.5, 4))
    gt_drawn = False
    for label, out_dir in runs:
        cache = _guided_dir(out_dir) / "metrics" / "rapsd" / f"{var}_rapsd.npz"
        if not cache.exists():
            print(f"skip {label}: no rapsd cache {cache}")
            continue
        r = np.load(cache)
        wl = r["wavelengths"][1:]
        if not gt_drawn:
            gt = r["gt_rapsd_over_time"].mean(axis=0)[1:]
            ax.loglog(1.0 / wl, gt, "k-", lw=2, label="ground truth")
            gt_drawn = True
        sp = r["sample_rapsd_over_time"].mean(axis=(0, 1))[1:]
        ax.loglog(1.0 / wl, sp, lw=1.2, label=label)
    ax.set_xlabel("wavenumber [1/km]")
    ax.set_ylabel("normalized RAPSD")
    ax.set_title(f"{var}: ensemble spectra across training")
    ax.legend(fontsize=8)
    fig.tight_layout()
    out = dest / f"spectra_progression_{var}.png"
    fig.savefig(out, dpi=130)
    plt.close(fig)
    return str(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("final_out")
    ap.add_argument("--probe", action="append", default=[],
                    help="LABEL=OUT_DIR of an earlier-checkpoint fidelity run")
    ap.add_argument("--dest", default="docs/fidelity")
    ap.add_argument("--vars", default="uas,psl")
    args = ap.parse_args()

    final = pathlib.Path(args.final_out)
    dest = pathlib.Path(args.dest)
    dest.mkdir(parents=True, exist_ok=True)

    figdir = _guided_dir(final) / "figures"
    # the report's Figures: pointer must reference the copied PNGs next to
    # the document, not the (gitignored) run directory
    text = (final / "FIDELITY.md").read_text().replace(
        f"`{figdir}/`", "the PNGs in this directory"
    ).replace(str(figdir), ".")
    (dest / "FIDELITY.md").write_text(text)
    for png in sorted(figdir.glob("*.png")):
        shutil.copy(png, dest / png.name)
        print(f"copied {png.name}")

    runs = []
    for spec in args.probe:
        label, _, d = spec.partition("=")
        runs.append((label, pathlib.Path(d)))
    runs.append(("final", final))
    if len(runs) > 1:
        for v in args.vars.split(","):
            print("wrote", progression_figure(runs, dest, var=v.strip()))


if __name__ == "__main__":
    main()
