"""Branch tests for the H8 composer (docs/fidelity/meso128/H8_PREREG.md):
amplitude gate < 2.0 on both winds; validity precondition >= 2.5 on the
deterministic control; VOID branch; clock clause; hard-fails on missing
declared artifacts."""

import importlib.util
import pathlib
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location(
    "h8_verdict", _ROOT / "scripts" / "h8_verdict.py"
)
h8 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(h8)

VARS = ("psl", "tas", "uas", "vas")
METRICS = ("wasserstein", "melr", "ssim")


def _amp_md(path, sections):
    """sections: {key: {var: median}}"""
    lines = ["# amp", ""]
    for key, rows in sections.items():
        lines += [f"## {key}", "", "| variable | median | mean ± std |",
                  "|---|---|---|"]
        for v in VARS:
            med = rows.get(v, 1.0)
            lines.append(f"| {v} | {med:.3f} | {med:.3f} ± 0.100 |")
        lines.append("")
    path.write_text("\n".join(lines) + "\n")
    return path


def _eval_dir(path, melr_uas=1.0, ssim_uas=0.9, w2_uas=1.0):
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
        lines += [f"## {d}", "", "| variable | source | obs | gen | grid |",
                  "|---|---|---|---|---|"]
        for v in VARS:
            lines.append(f"| {v} | guided | 1.0 | 1.0 | 1.0 |")
        lines.append("")
    path.write_text("\n".join(lines) + "\n")
    return path


def _run(monkeypatch, tmp_path, treated, control, with_bc=False):
    a = _eval_dir(tmp_path / "a")
    dirs = [str(a)]
    amp = _amp_md(tmp_path / "amp.md",
                  {"A": treated, "CTRL": control,
                   **({"B": {v: 1.0 for v in VARS},
                       "C": {v: 1.0 for v in VARS}} if with_bc else {})})
    argv = ["h8_verdict.py", "--amplitude", str(amp),
            "--treated-key", "A", "--control-key", "CTRL",
            "--point-a", str(a)]
    if with_bc:
        b = _eval_dir(tmp_path / "b")
        c = _eval_dir(tmp_path / "c", melr_uas=2.0, ssim_uas=0.1)
        dirs += [str(b), str(c)]
        argv += ["--point-b", str(b), "--amp-b-key", "B",
                 "--point-c", str(c), "--amp-c-key", "C"]
    bands = _bands(tmp_path / "bands.md", dirs)
    out = tmp_path / "H8.md"
    argv += ["--bands", str(bands), "--out", str(out)]
    monkeypatch.setattr(sys, "argv", argv)
    h8.main()
    return out.read_text()


GOOD_CTRL = {"uas": 4.0, "vas": 4.0, "tas": 6.0, "psl": 4.0}


def test_confirmed(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                treated={"uas": 1.2, "vas": 1.5}, control=GOOD_CTRL)
    assert text.startswith("# H8 result — CONFIRMED")
    assert "deterministic-ODE artifact" in text


def test_not_confirmed_one_wind_over(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                treated={"uas": 1.2, "vas": 2.4}, control=GOOD_CTRL)
    assert text.startswith("# H8 result — NOT confirmed")
    assert "model-mediated" in text


def test_void_when_control_below_validity_bar(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                treated={"uas": 1.2, "vas": 1.2},
                control={"uas": 1.5, "vas": 4.0, "tas": 6.0, "psl": 4.0})
    assert text.startswith("# H8 result — VOID")
    assert "no mechanism conclusion" in text


def test_clock_clause_bc_not_run(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                treated={"uas": 1.2, "vas": 1.2}, control=GOOD_CTRL)
    assert text.count("NOT RUN (clock clause)") == 2


def test_bc_judged_when_present(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                treated={"uas": 1.2, "vas": 1.2}, control=GOOD_CTRL,
                with_bc=True)
    # point B passes all three fabricated uas criteria, point C fails (a)+(b)
    assert "uas three-part criterion — pass" in text
    assert "uas three-part criterion — fail" in text


def test_missing_amplitude_section_hard_fails(monkeypatch, tmp_path):
    a = _eval_dir(tmp_path / "a")
    amp = _amp_md(tmp_path / "amp.md", {"A": {"uas": 1.0, "vas": 1.0}})
    bands = _bands(tmp_path / "bands.md", [str(a)])
    monkeypatch.setattr(sys, "argv", [
        "h8_verdict.py", "--amplitude", str(amp), "--treated-key", "A",
        "--control-key", "CTRL", "--point-a", str(a),
        "--bands", str(bands), "--out", str(tmp_path / "H8.md")])
    with pytest.raises(SystemExit, match="no section 'CTRL'"):
        h8.main()


def test_missing_bands_rows_hard_fail(monkeypatch, tmp_path):
    a = _eval_dir(tmp_path / "a")
    amp = _amp_md(tmp_path / "amp.md", {"A": GOOD_CTRL, "CTRL": GOOD_CTRL})
    bands = _bands(tmp_path / "bands.md", ["someother"])
    monkeypatch.setattr(sys, "argv", [
        "h8_verdict.py", "--amplitude", str(amp), "--treated-key", "A",
        "--control-key", "CTRL", "--point-a", str(a),
        "--bands", str(bands), "--out", str(tmp_path / "H8.md")])
    with pytest.raises(SystemExit, match="no band rows"):
        h8.main()
