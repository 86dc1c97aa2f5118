"""Hardening pins for the unattended-eval composer chain (VERDICT r4
next-step 5): the verdict must crash loudly — not compose silently — when a
gating baseline or a declared input artifact is missing, and the progression
report must include MELR (the gating metric) by default.
"""

import importlib.util
import pathlib
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, _ROOT / "scripts" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


verdict = _load("meso128_verdict")
progression = _load("progression_report")

VARS = ("psl", "tas", "uas", "vas")
METRICS = ("wasserstein", "melr", "ssim", "crps", "spread_skill",
           "rank_reliability")


def _fidelity_md(path: pathlib.Path, base="1.000"):
    lines = ["# Statistical fidelity report", "",
             "| metric | variable | guided | unconditional | interp. obs baseline |",
             "|---|---|---|---|---|"]
    for m in METRICS:
        for v in VARS:
            b = "n/a" if base is None else f"{base} ± 0.0000"
            lines.append(f"| {m} | {v} | 1.5000 ± 0.0100 | 2.0000 ± 0.0100 | {b} |")
    path.mkdir(parents=True, exist_ok=True)
    (path / "FIDELITY.md").write_text("\n".join(lines) + "\n")
    return path


def test_h1_rows_systemexit_on_missing_baseline(tmp_path):
    tab = verdict.parse_table(
        _fidelity_md(tmp_path / "row", base=None) / "FIDELITY.md"
    )
    with pytest.raises(SystemExit, match="no interp baseline"):
        verdict.h1_rows(tab, "point")


def test_composer_refuses_missing_declared_artifact(tmp_path, monkeypatch):
    dirs = {k: _fidelity_md(tmp_path / k) for k in ("cosmo", "tuned", "sde")}
    out = tmp_path / "out.md"
    argv = ["meso128_verdict.py",
            "--cosmo", str(dirs["cosmo"]), "--tuned", str(dirs["tuned"]),
            "--sde", str(dirs["sde"]), "--out", str(out),
            "--bands", str(tmp_path / "never_written_bands.md")]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit, match="declared artifact --bands"):
        verdict.main()
    assert not out.exists()  # no verdict without the pre-registered input


def test_composer_composes_when_artifacts_exist(tmp_path, monkeypatch):
    dirs = {k: _fidelity_md(tmp_path / k) for k in ("cosmo", "tuned", "sde")}
    bands = tmp_path / "bands.md"
    bands.write_text("# bands\n")
    out = tmp_path / "out.md"
    argv = ["meso128_verdict.py",
            "--cosmo", str(dirs["cosmo"]), "--tuned", str(dirs["tuned"]),
            "--sde", str(dirs["sde"]), "--out", str(out),
            "--bands", str(bands)]
    monkeypatch.setattr(sys, "argv", argv)
    verdict.main()
    text = out.read_text()
    assert "Band-restricted spectral error" in text
    # guided 1.5 < base n/a→1.0? guided 1.5 vs base 1.0: does not beat
    assert "H1 NOT confirmed" in text


def test_progression_default_metrics_include_melr():
    # the gating metric must be in the default trend tables (VERDICT r4
    # weak-item 3: the round-4 progression showed every curve except MELR)
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("probe_root")
    default = None
    # read the module-declared default instead of re-running main()
    src = (_ROOT / "scripts" / "progression_report.py").read_text()
    for line in src.splitlines():
        if 'default="' in line and "w2" in line:
            default = line.split('"')[1]
            break
    assert default is not None
    assert "melr" in default.split(",")
