"""Branch tests for the H6 composer (docs/fidelity/meso128/H6_PREREG.md):
mechanical gate on (a) MELR < 1.3785, (b) SSIM > 0.5256 ∧ > 0.2641,
(c) W2 < 4.3010; open two-point disjunction; hard-fail on missing declared
artifacts; clock clause on point A alone."""

import importlib.util
import pathlib
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location(
    "h6_verdict", _ROOT / "scripts" / "h6_verdict.py"
)
h6 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(h6)

VARS = ("psl", "tas", "uas", "vas")
METRICS = ("wasserstein", "melr", "ssim")


def _eval_dir(path, melr_uas, ssim_uas, w2_uas):
    vals = {("melr", "uas"): melr_uas, ("ssim", "uas"): ssim_uas,
            ("wasserstein", "uas"): w2_uas}
    lines = ["# Statistical fidelity report", "",
             "| metric | variable | guided | unconditional | interp. obs baseline |",
             "|---|---|---|---|---|"]
    for m in METRICS:
        for v in VARS:
            g = vals.get((m, v), 1.0)
            lines.append(
                f"| {m} | {v} | {g:.4f} ± 0.0100 | 1.3000 ± 0.0100 | 0.9 ± 0.0 |"
            )
    path.mkdir(parents=True, exist_ok=True)
    (path / "FIDELITY.md").write_text("\n".join(lines) + "\n")
    return path


def _bands(path, dirs):
    lines = ["# bands"]
    for d in dirs:
        lines += [f"## {d}", "",
                  "| variable | source | obs | gen | grid |",
                  "|---|---|---|---|---|"]
        for v in VARS:
            for src in ("guided", "unconditional", "interp baseline"):
                lines.append(f"| {v} | {src} | 1.0 | 1.0 | 1.0 |")
        lines.append("")
    path.write_text("\n".join(lines) + "\n")
    return path


def _run(monkeypatch, tmp_path, a_vals, b_vals=None):
    a = _eval_dir(tmp_path / "a", *a_vals)
    dirs = [str(a)]
    argv = ["h6_verdict.py", "--point-a", str(a)]
    if b_vals is not None:
        b = _eval_dir(tmp_path / "b", *b_vals)
        dirs.append(str(b))
        argv += ["--point-b", str(b)]
    bands = _bands(tmp_path / "bands.md", dirs)
    out = tmp_path / "H6.md"
    argv += ["--bands", str(bands), "--out", str(out)]
    monkeypatch.setattr(sys, "argv", argv)
    h6.main()
    return out.read_text()


def test_confirmed_when_point_a_passes(tmp_path, monkeypatch):
    text = _run(monkeypatch, tmp_path,
                a_vals=(1.19, 0.60, 2.0), b_vals=(2.0, 0.1, 9.0))
    assert "H6 result — CONFIRMED" in text
    assert "resolved positively" in text


def test_ssim_failure_branch(tmp_path, monkeypatch):
    # (a) passes at both points, (b) fails at both -> blur-rewarded reading
    text = _run(monkeypatch, tmp_path,
                a_vals=(1.19, 0.40, 2.0), b_vals=(1.25, 0.30, 2.0))
    assert "NOT confirmed" in text
    assert "rewards blur" in text


def test_a_fail_everywhere_branch(tmp_path, monkeypatch):
    text = _run(monkeypatch, tmp_path,
                a_vals=(1.80, 0.60, 2.0), b_vals=(1.90, 0.60, 2.0))
    assert "NOT confirmed" in text
    assert "falsified at production geometry" in text


def test_clock_clause_point_a_alone(tmp_path, monkeypatch):
    text = _run(monkeypatch, tmp_path, a_vals=(1.19, 0.60, 2.0))
    assert "Clock clause invoked" in text
    assert "CONFIRMED" in text


def test_hard_fail_missing_bands(tmp_path, monkeypatch):
    a = _eval_dir(tmp_path / "a", 1.19, 0.60, 2.0)
    out = tmp_path / "H6.md"
    monkeypatch.setattr(sys, "argv", [
        "h6_verdict.py", "--point-a", str(a),
        "--bands", str(tmp_path / "missing.md"), "--out", str(out)])
    with pytest.raises(SystemExit, match="band diagnostic missing"):
        h6.main()
    assert not out.exists()


def test_hard_fail_missing_band_section(tmp_path, monkeypatch):
    a = _eval_dir(tmp_path / "a", 1.19, 0.60, 2.0)
    bands = tmp_path / "bands.md"
    bands.write_text("# bands\n## some/other/dir\n| uas | guided | 1 | 1 | 1 |\n")
    out = tmp_path / "H6.md"
    monkeypatch.setattr(sys, "argv", [
        "h6_verdict.py", "--point-a", str(a),
        "--bands", str(bands), "--out", str(out)])
    with pytest.raises(SystemExit, match="no band rows"):
        h6.main()
    assert not out.exists()
