"""Pins for the mechanical H3 composer (scripts/h3_verdict.py): the three
interpretation branches of H3_PREREG.md's frozen map, the shortfall clause,
and the hard-fail-on-missing-artifact rule (VERDICT r4 next-step 5)."""

import importlib.util
import pathlib
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location(
    "h3_verdict", _ROOT / "scripts" / "h3_verdict.py"
)
h3 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(h3)

VARS = ("psl", "tas", "uas", "vas")


def _eval_dir(tmp_path: pathlib.Path) -> pathlib.Path:
    d = tmp_path / "h3_eval_cosmo"
    d.mkdir(parents=True, exist_ok=True)
    lines = ["| metric | variable | guided | unconditional | interp. obs baseline |",
             "|---|---|---|---|---|"]
    for v in VARS:
        lines.append(f"| melr | {v} | 2.2000 ± 0.0100 | 1.4000 ± 0.0100 | 1.3000 ± 0.0000 |")
    (d / "FIDELITY.md").write_text("\n".join(lines) + "\n")
    return d


def _bands_md(tmp_path: pathlib.Path, eval_dir: pathlib.Path, vas_gen: float):
    p = tmp_path / "bands.md"
    lines = ["# Band-restricted spectral error", "",
             f"## {eval_dir}", "",
             "| variable | source | obs (a) | gen (b) | grid (c) |",
             "|---|---|---|---|---|"]
    for v in VARS:
        gen = vas_gen if v == "vas" else 1.200
        lines.append(f"| {v} | guided | 1.800 | 1.700 | 2.600 |")
        lines.append(f"| {v} | unconditional | 1.900 | {gen:.3f} | 1.300 |")
        lines.append(f"| {v} | interp baseline | 0.700 | 1.400 | 1.400 |")
    p.write_text("\n".join(lines) + "\n")
    return p


def _run(tmp_path, monkeypatch, vas_gen, kdata=13631):
    ev = _eval_dir(tmp_path)
    bands = _bands_md(tmp_path, ev, vas_gen)
    prog = tmp_path / "prog.txt"
    prog.write_text("probe table\n")
    out = tmp_path / "H3_RESULT.md"
    monkeypatch.setattr(sys, "argv", [
        "h3_verdict.py", "--eval-dir", str(ev), "--bands", str(bands),
        "--progression", str(prog), "--snapshot-kdata", str(kdata),
        "--out", str(out)])
    h3.main()
    return out.read_text()


def test_confirmed_branch(tmp_path, monkeypatch):
    txt = _run(tmp_path, monkeypatch, vas_gen=2.252 - 0.30)
    assert txt.startswith("# H3 result — CONFIRMED")
    assert "training-budget-limited" in txt


def test_plateau_branch(tmp_path, monkeypatch):
    txt = _run(tmp_path, monkeypatch, vas_gen=2.252 - 0.10)
    assert "NOT confirmed (plateau)" in txt.splitlines()[0]
    assert "more data, not more epochs" in txt


def test_rise_branch_and_shortfall(tmp_path, monkeypatch):
    txt = _run(tmp_path, monkeypatch, vas_gen=2.252 + 0.40, kdata=12583)
    assert "NOT confirmed (rise > 0.15)" in txt.splitlines()[0]
    assert "Shortfall" in txt and "12583Ki" in txt


def test_hard_fail_on_missing_bands(tmp_path, monkeypatch):
    ev = _eval_dir(tmp_path)
    prog = tmp_path / "prog.txt"
    prog.write_text("t\n")
    monkeypatch.setattr(sys, "argv", [
        "h3_verdict.py", "--eval-dir", str(ev),
        "--bands", str(tmp_path / "never.md"),
        "--progression", str(prog), "--snapshot-kdata", "13631",
        "--out", str(tmp_path / "o.md")])
    with pytest.raises(SystemExit, match="band diagnostic missing"):
        h3.main()


def test_hard_fail_on_missing_band_cell(tmp_path, monkeypatch):
    ev = _eval_dir(tmp_path)
    bands = tmp_path / "bands.md"
    bands.write_text(f"## {ev}\n| uas | guided | 1.0 | 1.0 | 1.0 |\n")
    prog = tmp_path / "prog.txt"
    prog.write_text("t\n")
    monkeypatch.setattr(sys, "argv", [
        "h3_verdict.py", "--eval-dir", str(ev), "--bands", str(bands),
        "--progression", str(prog), "--snapshot-kdata", "13631",
        "--out", str(tmp_path / "o.md")])
    with pytest.raises(SystemExit, match="absent"):
        h3.main()
