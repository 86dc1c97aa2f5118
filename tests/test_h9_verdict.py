"""Branch tests for the H9 composer (docs/fidelity/meso128/H9_PREREG.md):
window-relative three-part gate on both winds; amplitude-honesty VOID
branch; seed-vs-window reading branches; clock clause; hard-fails on
missing declared artifacts and missing interp baselines."""

import importlib.util
import pathlib
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location(
    "h9_verdict", _ROOT / "scripts" / "h9_verdict.py"
)
h9 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(h9)

VARS = ("psl", "tas", "uas", "vas")
METRICS = ("wasserstein", "melr", "ssim", "crps")

# guided values that pass the window-relative rule against the fixture
# bars below (uncond 1.3 except ssim 0.1; interp melr/w2 0.9, ssim 0.5)
PASSING = dict(melr=0.2, ssim=0.8, wasserstein=0.4, crps=0.1)


def _eval_dir(path, overrides=None, interp_na=False):
    """overrides: {(metric, var): guided value}"""
    overrides = overrides or {}
    lines = ["# Statistical fidelity report", "",
             "| metric | variable | guided | unconditional | interp. obs baseline |",
             "|---|---|---|---|---|"]
    for m in METRICS:
        for v in VARS:
            g = overrides.get((m, v), PASSING[m])
            interp = "n/a" if interp_na else (
                "0.5000 ± 0.0000" if m == "ssim" else "0.9000 ± 0.0000")
            uncond = "0.1000 ± 0.0100" if m == "ssim" else "1.3000 ± 0.0100"
            lines.append(
                f"| {m} | {v} | {g:.4f} ± 0.0100 | {uncond} | {interp} |"
            )
    path.mkdir(parents=True, exist_ok=True)
    (path / "FIDELITY.md").write_text("\n".join(lines) + "\n")
    return path


def _amp_md(path, sections):
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


def _run(monkeypatch, tmp_path, a_overrides=None, b_overrides=None,
         amp_a=None, with_b=True):
    a = _eval_dir(tmp_path / "a", a_overrides)
    dirs = [str(a)]
    sections = {"A": amp_a or {v: 1.0 for v in VARS}}
    argv = ["h9_verdict.py", "--point-a", str(a), "--amp-a-key", "A"]
    if with_b:
        b = _eval_dir(tmp_path / "b", b_overrides)
        dirs.append(str(b))
        sections["B"] = {v: 1.0 for v in VARS}
        argv += ["--point-b", str(b), "--amp-b-key", "B"]
    amp = _amp_md(tmp_path / "amp.md", sections)
    bands = _bands(tmp_path / "bands.md", dirs)
    out = tmp_path / "H9.md"
    argv += ["--amplitude", str(amp), "--bands", str(bands),
             "--out", str(out)]
    monkeypatch.setattr(sys, "argv", argv)
    h9.main()
    return out.read_text()


def test_confirmed(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path)
    assert text.startswith("# H9 result — CONFIRMED")
    assert "first CONFIRMED passing spectral-fidelity setting" in text


def test_not_confirmed_one_wind_melr_over_bar(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                a_overrides={("melr", "vas"): 1.2})  # > interp 0.9
    assert text.startswith("# H9 result — NOT confirmed")
    assert "vas three-part criterion (gating) — fail" in text
    # B passed -> window-specific reading
    assert "window-specific skill" in text


def test_seed_fragile_when_both_points_fail(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                a_overrides={("ssim", "uas"): 0.3},   # < interp 0.5
                b_overrides={("ssim", "uas"): 0.3})
    assert text.startswith("# H9 result — NOT confirmed")
    assert "seed-fragile" in text


def test_void_when_amplitude_dishonest(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path, amp_a={"uas": 2.1, "vas": 1.0})
    assert text.startswith("# H9 result — VOID")
    assert "audit the per-annulus gains" in text


def test_tas_psl_fail_rows_do_not_gate(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                a_overrides={("ssim", "tas"): 0.1, ("melr", "psl"): 5.0})
    assert text.startswith("# H9 result — CONFIRMED")
    assert "tas three-part criterion — fail" in text
    assert "psl three-part criterion — fail" in text


def test_clock_clause_b_not_run(monkeypatch, tmp_path):
    text = _run(monkeypatch, tmp_path,
                a_overrides={("wasserstein", "uas"): 2.0},  # > uncond 1.3
                with_b=False)
    assert "NOT RUN (clock clause)" in text
    assert "attribution is OPEN" in text


def test_missing_interp_baseline_hard_fails(monkeypatch, tmp_path):
    a = _eval_dir(tmp_path / "a", interp_na=True)
    amp = _amp_md(tmp_path / "amp.md", {"A": {v: 1.0 for v in VARS}})
    bands = _bands(tmp_path / "bands.md", [str(a)])
    monkeypatch.setattr(sys, "argv", [
        "h9_verdict.py", "--point-a", str(a), "--amp-a-key", "A",
        "--amplitude", str(amp), "--bands", str(bands),
        "--out", str(tmp_path / "H9.md")])
    with pytest.raises(SystemExit, match="no interp baseline"):
        h9.main()


def test_missing_bands_rows_hard_fail(monkeypatch, tmp_path):
    a = _eval_dir(tmp_path / "a")
    amp = _amp_md(tmp_path / "amp.md", {"A": {v: 1.0 for v in VARS}})
    bands = _bands(tmp_path / "bands.md", ["someother"])
    monkeypatch.setattr(sys, "argv", [
        "h9_verdict.py", "--point-a", str(a), "--amp-a-key", "A",
        "--amplitude", str(amp), "--bands", str(bands),
        "--out", str(tmp_path / "H9.md")])
    with pytest.raises(SystemExit, match="no band rows"):
        h9.main()


def test_missing_amplitude_section_hard_fails(monkeypatch, tmp_path):
    a = _eval_dir(tmp_path / "a")
    amp = _amp_md(tmp_path / "amp.md", {"WRONG": {v: 1.0 for v in VARS}})
    bands = _bands(tmp_path / "bands.md", [str(a)])
    monkeypatch.setattr(sys, "argv", [
        "h9_verdict.py", "--point-a", str(a), "--amp-a-key", "A",
        "--amplitude", str(amp), "--bands", str(bands),
        "--out", str(tmp_path / "H9.md")])
    with pytest.raises(SystemExit, match="no section 'A'"):
        h9.main()
