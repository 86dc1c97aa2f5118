"""Pins for the mechanical H5 composer (scripts/h5_verdict.py): the gate
disjunction with rule-derived unconditional bars (parsed from the H3-eval
table, not hard-coded), the vas secondary, the interpretation-map
branches, the clock clause, and the hard-fail-on-missing-artifact rules."""

import importlib.util
import pathlib
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location(
    "h5_verdict", _ROOT / "scripts" / "h5_verdict.py"
)
h5 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(h5)


def _table(rows):
    lines = ["| metric | variable | guided | unconditional | interp. obs baseline |",
             "|---|---|---|---|---|"]
    for metric, var, guided, uncond in rows:
        lines.append(
            f"| {metric} | {var} | {guided:.4f} ± 0.0500 | "
            f"{uncond:.4f} ± 0.0500 | 1.0000 ± 0.0000 |")
    return "\n".join(lines) + "\n"


def _full_rows(uas_g, uas_u, vas_g=(5.0, 0.5, 2.0), vas_u=(6.0, 0.3, 9.0)):
    """(melr, ssim, w2) triples for uas/vas + filler tas/psl."""
    rows = []
    for var, g, u in (("uas", uas_g, uas_u), ("vas", vas_g, vas_u),
                      ("tas", (5.0, 0.5, 2.0), (6.0, 0.3, 9.0)),
                      ("psl", (5.0, 0.5, 2.0), (6.0, 0.3, 9.0))):
        rows.append(("melr", var, g[0], u[0]))
        rows.append(("ssim", var, g[1], u[1]))
        rows.append(("wasserstein", var, g[2], u[2]))
    return rows


def _h3_eval(tmp_path, uas_uncond=(1.45, 0.30, 4.50),
             vas_uncond=(2.20, 0.02, 9.00)):
    d = tmp_path / "h3_eval"
    d.mkdir(parents=True, exist_ok=True)
    # guided values in the H3 table are irrelevant to the bar rule
    rows = _full_rows((2.0, 0.6, 2.0), uas_uncond,
                      (2.5, 0.6, 1.5), vas_uncond)
    (d / "FIDELITY.md").write_text(_table(rows))
    return d


def _point(tmp_path, name, uas_g, uas_u=(1.40, 0.30, 4.40),
           vas_g=(2.5, 0.6, 1.5), vas_u=(2.2, 0.02, 9.0)):
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    (d / "FIDELITY.md").write_text(
        _table(_full_rows(uas_g, uas_u, vas_g, vas_u)))
    return d


def _bands(tmp_path, dirs):
    p = tmp_path / "bands.md"
    parts = []
    for d in dirs:
        parts += [f"## {d}", "| variable | source | a | b | c |",
                  "|---|---|---|---|---|"]
        for v in ("uas", "vas"):
            parts.append(f"| {v} | guided | 1.500 | 1.400 | 1.600 |")
            parts.append(f"| {v} | unconditional | 1.900 | 1.286 | 1.332 |")
    p.write_text("\n".join(parts) + "\n")
    return p


def _run(tmp_path, monkeypatch, a_point, b_point=None, h3=None):
    h3 = h3 or _h3_eval(tmp_path)
    dirs = [a_point]
    argv = ["h5_verdict.py", "--point-a", str(a_point), "--h3-eval", str(h3)]
    if b_point is not None:
        dirs.append(b_point)
        argv += ["--point-b", str(b_point)]
    bands = _bands(tmp_path, dirs)
    out = tmp_path / "H5_RESULT.md"
    argv += ["--bands", str(bands), "--out", str(out),
             "--snapshot-kdata", "13631"]
    monkeypatch.setattr(sys, "argv", argv)
    h5.main()
    return out.read_text()


def test_confirmed_by_disjunction_with_rule_bars(tmp_path, monkeypatch):
    # H3-eval uncond: SSIM 0.30, W2 4.50 — the rule-derived bars.
    # Point A fails (a); point B passes (a) MELR<1.3785, (b) SSIM>0.5256
    # and >0.30, (c) W2<4.50 -> CONFIRMED.
    a = _point(tmp_path, "a", (2.0, 0.69, 2.0))
    b = _point(tmp_path, "b", (1.30, 0.60, 2.5))
    txt = _run(tmp_path, monkeypatch, a, b)
    assert txt.startswith("# H5 result — CONFIRMED")
    assert "Point B (t_rel=0.5) — PASS" in txt
    assert "weak-item 5 is resolved positively" in txt


def test_rule_bars_bind_not_frozen_h1_values(tmp_path, monkeypatch):
    # With a HIGH H3-eval uncond SSIM (0.62), a point with SSIM 0.60 must
    # FAIL (b) even though it beats the frozen interp 0.5256 — proving the
    # bars come from the H3 table, not the H1 constants.
    h3 = _h3_eval(tmp_path, uas_uncond=(1.45, 0.62, 4.50))
    a = _point(tmp_path, "a", (1.30, 0.60, 2.5))
    txt = _run(tmp_path, monkeypatch, a, h3=h3)
    assert "NOT confirmed" in txt.splitlines()[0]


def test_model_spectrum_reading(tmp_path, monkeypatch):
    # Both points fail (a) with guided ~= their fresh uncond, and the
    # H3-eval uncond MELR (1.45) sits above the 1.3785 bar.
    a = _point(tmp_path, "a", (1.44, 0.60, 2.0), uas_u=(1.42, 0.30, 4.40))
    b = _point(tmp_path, "b", (1.43, 0.58, 2.0), uas_u=(1.40, 0.30, 4.40))
    txt = _run(tmp_path, monkeypatch, a, b)
    assert "model spectrum remains the binding constraint" in txt


def test_insufficient_release_reading(tmp_path, monkeypatch):
    a = _point(tmp_path, "a", (1.90, 0.60, 2.0), uas_u=(1.35, 0.30, 4.40))
    b = _point(tmp_path, "b", (1.80, 0.58, 2.0), uas_u=(1.35, 0.30, 4.40))
    txt = _run(tmp_path, monkeypatch, a, b)
    assert "release is insufficient" in txt


def test_pareto_reading_and_clock_clause(tmp_path, monkeypatch):
    a = _point(tmp_path, "a", (1.30, 0.20, 2.0))
    txt = _run(tmp_path, monkeypatch, a)
    assert "Clock clause invoked" in txt
    assert "Pareto dial" in txt


def test_vas_secondary_reported(tmp_path, monkeypatch):
    # vas passing its own bars is reported as the pre-stated secondary.
    h3 = _h3_eval(tmp_path, vas_uncond=(2.20, 0.02, 9.00))
    a = _point(tmp_path, "a", (1.30, 0.60, 2.5),
               vas_g=(1.20, 0.65, 1.5))
    txt = _run(tmp_path, monkeypatch, a, h3=h3)
    assert "vas secondary (pre-stated, non-gating): PASSES" in txt


def test_hard_fail_on_missing_h3_eval(tmp_path, monkeypatch):
    a = _point(tmp_path, "a", (1.30, 0.60, 2.5))
    bands = _bands(tmp_path, [a])
    monkeypatch.setattr(sys, "argv", [
        "h5_verdict.py", "--point-a", str(a), "--bands", str(bands),
        "--h3-eval", str(tmp_path / "never"),
        "--out", str(tmp_path / "o.md")])
    with pytest.raises(SystemExit, match="unconditional-bar source"):
        h5.main()


def test_hard_fail_on_missing_bands(tmp_path, monkeypatch):
    a = _point(tmp_path, "a", (1.30, 0.60, 2.5))
    h3 = _h3_eval(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "h5_verdict.py", "--point-a", str(a),
        "--bands", str(tmp_path / "never.md"), "--h3-eval", str(h3),
        "--out", str(tmp_path / "o.md")])
    with pytest.raises(SystemExit, match="band diagnostic missing"):
        h5.main()
