"""Render a training loss curve (or several) from run metrics.jsonl files.

Each positional argument is ``LABEL=PATH`` where PATH is a run's
``metrics.jsonl`` (the JSONL stream `utils/logging.py` RunLogger writes,
``train/loss`` keyed by ``train/ndata``).  Each run is drawn as a thin raw
trace plus a rolling-median smooth; y is log-scaled (diffusion losses span
decades early in training).

Usage:
    python scripts/loss_curve.py mesoscale=runs/meso72m/metrics.jsonl \
        [smooth=runs/old/metrics.jsonl ...] [--out loss_curve.png]
"""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np

# one hue per run, fixed assignment order (raw trace is always light gray)
_COLORS = ["#2a7de1", "#d97706", "#059669", "#7c3aed"]


def read_series(path: pathlib.Path):
    """(ndata, loss) arrays from a RunLogger metrics.jsonl."""
    nd, loss = [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec and "train/ndata" in rec:
                nd.append(rec["train/ndata"])
                loss.append(rec["train/loss"])
    return np.asarray(nd, dtype=np.float64), np.asarray(loss, dtype=np.float64)


def rolling_median(y: np.ndarray, w: int) -> np.ndarray:
    if len(y) <= w:
        return y
    pad = w // 2
    ypad = np.pad(y, (pad, w - 1 - pad), mode="edge")
    return np.median(np.lib.stride_tricks.sliding_window_view(ypad, w), axis=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="LABEL=metrics.jsonl per run")
    ap.add_argument("--out", default="loss_curve.png")
    ap.add_argument("--window", type=int, default=25,
                    help="rolling-median window (log points)")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.5, 3.6))
    for i, spec in enumerate(args.runs):
        label, _, path = spec.partition("=")
        nd, loss = read_series(pathlib.Path(path))
        if not len(nd):
            print(f"skip {label}: no train/loss records in {path}")
            continue
        mi = nd / (1 << 20)
        ax.semilogy(mi, loss, color="0.8", lw=0.6, zorder=1)
        ax.semilogy(mi, rolling_median(loss, args.window),
                    color=_COLORS[i % len(_COLORS)], lw=1.6, zorder=2,
                    label=label)
    ax.set_xlabel("ndata [Mi]")
    ax.set_ylabel("training loss")
    ax.grid(True, which="both", color="0.92", lw=0.5, zorder=0)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    if len(args.runs) > 1:
        ax.legend(fontsize=8, frameon=False)
    else:
        ax.set_title(args.runs[0].partition("=")[0], fontsize=10)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
