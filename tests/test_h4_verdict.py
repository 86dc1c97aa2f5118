"""Pins for the mechanical H4 composer (scripts/h4_verdict.py): the gate
disjunction, all four interpretation-map branches, the clock clause, and
the hard-fail-on-missing-artifact rule."""

import importlib.util
import pathlib
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location(
    "h4_verdict", _ROOT / "scripts" / "h4_verdict.py"
)
h4 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(h4)


def _eval_dir(tmp_path, name, melr, ssim, w2, uncond_melr=1.35):
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    lines = ["| metric | variable | guided | unconditional | interp. obs baseline |",
             "|---|---|---|---|---|"]
    for v in ("psl", "tas", "uas", "vas"):
        gm = melr if v == "uas" else 5.0
        gs = ssim if v == "uas" else 0.5
        gw = w2 if v == "uas" else 2.0
        um = uncond_melr if v == "uas" else 6.0
        lines.append(f"| melr | {v} | {gm:.4f} ± 0.0500 | {um:.4f} ± 0.0500 | 1.3785 ± 0.0000 |")
        lines.append(f"| ssim | {v} | {gs:.4f} ± 0.0100 | 0.2641 ± 0.0100 | 0.5256 ± 0.0000 |")
        lines.append(f"| wasserstein | {v} | {gw:.4f} ± 0.0500 | 4.3010 ± 0.0500 | 0.3019 ± 0.0000 |")
    (d / "FIDELITY.md").write_text("\n".join(lines) + "\n")
    return d


def _bands(tmp_path, dirs):
    p = tmp_path / "bands.md"
    parts = []
    for d in dirs:
        parts += [f"## {d}", "| variable | source | a | b | c |", "|---|---|---|---|---|"]
        for v in ("uas", "vas"):
            parts.append(f"| {v} | guided | 1.500 | 1.400 | 1.600 |")
            parts.append(f"| {v} | unconditional | 1.900 | 1.286 | 1.332 |")
    p.write_text("\n".join(parts) + "\n")
    return p


def _run(tmp_path, monkeypatch, a_kw, b_kw=None):
    da = _eval_dir(tmp_path, "a", **a_kw)
    dirs = [da]
    argv = ["h4_verdict.py", "--point-a", str(da)]
    if b_kw is not None:
        db = _eval_dir(tmp_path, "b", **b_kw)
        dirs.append(db)
        argv += ["--point-b", str(db)]
    bands = _bands(tmp_path, dirs)
    out = tmp_path / "H4_RESULT.md"
    argv += ["--bands", str(bands), "--out", str(out)]
    monkeypatch.setattr(sys, "argv", argv)
    h4.main()
    return out.read_text()


def test_confirmed_by_disjunction(tmp_path, monkeypatch):
    # point A fails (a); point B passes all three -> CONFIRMED
    txt = _run(tmp_path, monkeypatch,
               dict(melr=2.0, ssim=0.69, w2=2.0),
               dict(melr=1.30, ssim=0.60, w2=2.5))
    assert txt.startswith("# H4 result — CONFIRMED")
    assert "Point B (t_rel=0.5) — PASS" in txt
    assert "winnable by formulation" in txt


def test_uncond_limited_reading(tmp_path, monkeypatch):
    # both fail (a) but guided ~= uncond -> model-spectrum reading
    txt = _run(tmp_path, monkeypatch,
               dict(melr=1.45, ssim=0.60, w2=2.0, uncond_melr=1.42),
               dict(melr=1.44, ssim=0.58, w2=2.0, uncond_melr=1.40))
    assert "NOT confirmed" in txt.splitlines()[0]
    assert "binding constraint is the model spectrum" in txt


def test_persistence_reading(tmp_path, monkeypatch):
    txt = _run(tmp_path, monkeypatch,
               dict(melr=1.90, ssim=0.60, w2=2.0, uncond_melr=1.35),
               dict(melr=1.80, ssim=0.58, w2=2.0, uncond_melr=1.35))
    assert "annealing is insufficient" in txt


def test_pareto_reading_and_clock_clause(tmp_path, monkeypatch):
    txt = _run(tmp_path, monkeypatch,
               dict(melr=1.30, ssim=0.30, w2=2.0))
    assert "Clock clause invoked" in txt
    assert "Pareto dial" in txt


def test_hard_fail_on_missing_bands(tmp_path, monkeypatch):
    da = _eval_dir(tmp_path, "a", melr=1.3, ssim=0.6, w2=2.0)
    monkeypatch.setattr(sys, "argv", [
        "h4_verdict.py", "--point-a", str(da),
        "--bands", str(tmp_path / "never.md"),
        "--out", str(tmp_path / "o.md")])
    with pytest.raises(SystemExit, match="band diagnostic missing"):
        h4.main()


def test_hard_fail_on_missing_band_section(tmp_path, monkeypatch):
    da = _eval_dir(tmp_path, "a", melr=1.3, ssim=0.6, w2=2.0)
    bands = tmp_path / "bands.md"
    bands.write_text("## some/other/dir\n| uas | guided | 1 | 1 | 1 |\n")
    monkeypatch.setattr(sys, "argv", [
        "h4_verdict.py", "--point-a", str(da), "--bands", str(bands),
        "--out", str(tmp_path / "o.md")])
    with pytest.raises(SystemExit, match="no band rows"):
        h4.main()
