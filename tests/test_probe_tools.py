"""Unit tests for the run-ops tooling around long training runs.

`scripts/probe_watcher.py` decides *which* snapshots get a mid-training
fidelity probe (cadence/rate filtering over the run directory) and
`scripts/progression_report.py` tabulates the per-checkpoint metrics the
probes produce. Both are pure-Python path/dict logic — bugs here silently
skip probes or drop table rows on a multi-hour run, so they get direct
coverage (no jax involved).
"""

import importlib.util
import pathlib
import pickle

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- watcher

def _mk_run(tmp_path, names):
    run = tmp_path / "run"
    run.mkdir()
    for n in names:
        (run / n).mkdir()
    return run


def test_due_snapshots_cadence_and_rate(tmp_path):
    pw = _load("probe_watcher")
    # snapshot dirs are written at a 1Mi cadence; kdata = ndata // 1000
    mi = lambda n: f"{round(n * 1048.576):07d}"
    run = _mk_run(tmp_path, [
        f"network-snapshot-{mi(1)}-0.999000",   # 1Mi: off-cadence for every-2
        f"network-snapshot-{mi(2)}-0.999000",   # 2Mi: due
        f"network-snapshot-{mi(2)}-0.999900",   # wrong EMA rate
        f"network-snapshot-{mi(2.5)}-0.999000",  # 2.5Mi (512Ki trainer cadence):
        f"network-snapshot-{mi(3.5)}-0.999000",  # ... must NOT round onto 2/4Mi
        f"network-snapshot-{mi(4)}-0.999000",   # 4Mi: due
        "training-state-0001234.ckpt",           # not a snapshot
        "figures",                               # unrelated dir
    ])
    due = pw.due_snapshots(run, rate="0.999000", every_mi=2)
    assert [k for k, _ in due] == [round(2 * 1048.576), round(4 * 1048.576)]
    assert all(p.name.endswith("-0.999000") for _, p in due)


def test_due_snapshots_sorted_and_missing_dir(tmp_path):
    pw = _load("probe_watcher")
    assert pw.due_snapshots(tmp_path / "nope", "0.999000", 2) == []
    run = _mk_run(tmp_path, [
        "network-snapshot-0006291-0.999000",  # 6Mi
        "network-snapshot-0002097-0.999000",  # 2Mi
    ])
    due = pw.due_snapshots(run, "0.999000", 2)
    assert [k for k, _ in due] == [2097, 6291]  # ascending regardless of listing


# ----------------------------------------------------------- progression

def _mk_probe(root, kdata, w2_by_var):
    d = root / str(kdata) / "guided" / "001_config" / "metrics" / "run"
    d.mkdir(parents=True)
    metrics = {
        "wasserstein": {
            v: {"global": np.asarray(vals), "interp_baseline": np.asarray([0.3])}
            for v, vals in w2_by_var.items()
        }
    }
    with open(d / "metrics.pickle", "wb") as f:
        pickle.dump(metrics, f)


def test_progression_rows_skip_incomplete(tmp_path):
    pr = _load("progression_report")
    _mk_probe(tmp_path, 2097, {"uas": [4.0, 4.2]})
    _mk_probe(tmp_path, 4194, {"uas": [3.0, 3.2]})
    (tmp_path / "6291").mkdir()          # probe started, no metrics yet
    (tmp_path / "notaprobe").mkdir()     # non-numeric dir ignored
    rows = list(pr.progression_rows(tmp_path))
    assert [k for k, _ in rows] == [2097, 4194]


def test_format_table_means_and_order(tmp_path):
    pr = _load("progression_report")
    _mk_probe(tmp_path, 2097, {"uas": [4.0, 6.0], "psl": [10.0, 10.0]})
    _mk_probe(tmp_path, 4194, {"uas": [2.0, 4.0], "psl": [8.0, 8.0]})
    rows = list(pr.progression_rows(tmp_path))
    table = pr.format_table(rows, ["w2"])
    # variables sorted, ensemble-mean values, kdata rendered as M of ndata
    assert "psl / uas" in table
    assert "| 2.10M | 10.0 / 5.0 |" in table
    assert "| 4.19M | 8.0 / 3.0 |" in table


def test_format_table_missing_metric_is_dropped(tmp_path):
    pr = _load("progression_report")
    _mk_probe(tmp_path, 2097, {"uas": [4.0]})
    rows = list(pr.progression_rows(tmp_path))
    assert pr.format_table(rows, ["ssim"]) == ""  # no ssim key anywhere
