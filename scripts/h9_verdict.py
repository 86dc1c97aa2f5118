"""Compose the pre-registered H9 verdict (docs/fidelity/meso128/H9_PREREG.md).

H9 (confirmatory): the full pipeline — COSMO guidance + DPM++(2M)-64
SDE eta=0.3 + denoise-final + climatological spectral calibration + t=0
spectral projection — passes the three-part criterion on uas AND vas on
a held-out window (2014-02-15-00, 49 h) with a fresh seed (1), against
bars computed window-relatively from the SAME run:

    (a) MELR_guided < MELR_interp
    (b) SSIM_guided > SSIM_interp AND SSIM_guided > SSIM_uncond
    (c) W2_guided   < W2_uncond

Validity precondition (amplitude honesty, DESIGN_STUDY.md): the treated
median amplitude ratio must lie in [0.5, 1.5] on uas AND vas, else VOID.

Registered secondaries: tas/psl rows; point B (H1 window, seed 1) under
the identical rule; amplitude tables; band decomposition (REQUIRED);
CRPS guided vs interp.

Mechanical, by-criterion. Hard-fails on missing declared artifacts.
Clock clause: --point-b may be empty if the round ended mid-chain; the
shortfall is stated.
"""

from __future__ import annotations

import argparse
import pathlib
import re

AMP_LO, AMP_HI = 0.5, 1.5
GATE_VARS = ("uas", "vas")
ALL_VARS = ("psl", "tas", "uas", "vas")

ROW_RE = re.compile(
    r"^\|\s*(?P<metric>\w+)\s*\|\s*(?P<var>\w+)\s*\|"
    r"\s*(?P<guided>[-\d.]+)\s*±\s*(?P<gsem>[\d.]+)\s*\|"
    r"\s*(?P<uncond>[-\d.]+)\s*±\s*[\d.]+\s*\|"
    r"\s*(?P<interp>(?:[-\d.]+\s*±\s*[\d.]+|n/a))\s*\|"
)
AMP_ROW_RE = re.compile(
    r"^\|\s*(?P<var>\w+)\s*\|\s*(?P<median>[\d.]+)\s*\|"
    r"\s*(?P<mean>[\d.]+)\s*±\s*(?P<std>[\d.]+)\s*\|"
)
BAND_ROW_RE = re.compile(r"^\|\s*\w+\s*\|\s*[\w .]+?\s*\|\s*[-\d.]+\s*\|")


def require(path: pathlib.Path, what: str) -> pathlib.Path:
    if not path.exists():
        raise SystemExit(f"H9 verdict: declared {what} missing: {path}")
    return path


def parse_fidelity(fid_md: pathlib.Path):
    out = {}
    for line in fid_md.read_text().splitlines():
        m = ROW_RE.match(line.strip())
        if m:
            interp = m.group("interp")
            out[(m.group("metric"), m.group("var"))] = {
                "guided": float(m.group("guided")),
                "gsem": float(m.group("gsem")),
                "uncond": float(m.group("uncond")),
                "interp": (None if interp == "n/a"
                           else float(interp.split("±")[0])),
            }
    if not out:
        raise SystemExit(f"H9 verdict: no metric rows parsed from {fid_md}")
    return out


def parse_amplitude(md: pathlib.Path):
    out, cur = {}, None
    for line in md.read_text().splitlines():
        if line.startswith("## "):
            cur = line[3:].strip()
            out[cur] = {}
            continue
        m = AMP_ROW_RE.match(line.strip())
        if m and cur is not None:
            out[cur][m.group("var")] = (
                float(m.group("median")),
                float(m.group("mean")),
                float(m.group("std")),
            )
    if not out:
        raise SystemExit(f"H9 verdict: no amplitude sections in {md}")
    return out


def amp_section(amp, key, what):
    for sec, rows in amp.items():
        if sec.rstrip("/") == key.rstrip("/"):
            for v in ALL_VARS:
                if v not in rows:
                    raise SystemExit(
                        f"H9 verdict: {what}: missing variable {v} in "
                        f"amplitude section {sec!r}"
                    )
            return rows
    raise SystemExit(
        f"H9 verdict: amplitude report has no section {key!r} ({what}); "
        f"sections: {sorted(amp)}"
    )


def bands_have(bands_md: pathlib.Path, eval_dir: str):
    in_sec, n = False, 0
    for line in bands_md.read_text().splitlines():
        if line.startswith("## "):
            in_sec = line[3:].strip().rstrip("/") == eval_dir.rstrip("/")
            continue
        if in_sec and BAND_ROW_RE.match(line.strip()):
            n += 1
    if n == 0:
        raise SystemExit(
            f"H9 verdict: no band rows for {eval_dir!r} in {bands_md}"
        )


def judge(tab, label, var):
    """Window-relative three-part criterion; hard-fails on missing rows
    or a missing interp baseline (the bar itself)."""
    need = [("melr", var), ("ssim", var), ("wasserstein", var)]
    for key in need:
        if key not in tab:
            raise SystemExit(f"H9 verdict: {label}: missing row {key}")
    melr, ssim, w2 = (tab[k] for k in need)
    for name, row in (("melr", melr), ("ssim", ssim)):
        if row["interp"] is None:
            raise SystemExit(
                f"H9 verdict: {label}: {name} {var} has no interp baseline "
                "(bar undefined) — metrics.run did not compute it"
            )
    crit = {
        "a": melr["guided"] < melr["interp"],
        "b": ssim["guided"] > ssim["interp"]
        and ssim["guided"] > ssim["uncond"],
        "c": w2["guided"] < w2["uncond"],
    }
    return crit, melr, ssim, w2


def fmt_judged(var, crit, melr, ssim, w2):
    return [
        "| criterion | bar (this window) | measured | verdict |",
        "|---|---|---|---|",
        f"| (a) {var} MELR | < {melr['interp']:.4f} (interp) "
        f"| {melr['guided']:.4f} ± {melr['gsem']:.4f} "
        f"| {'pass' if crit['a'] else 'FAIL'} |",
        f"| (b) {var} SSIM (protocol conv.) | > {ssim['interp']:.4f} (interp) "
        f"and > {ssim['uncond']:.4f} (uncond) | {ssim['guided']:.4f} "
        f"| {'pass' if crit['b'] else 'FAIL'} |",
        f"| (c) {var} W2 | < {w2['uncond']:.4f} (uncond) "
        f"| {w2['guided']:.4f} | {'pass' if crit['c'] else 'FAIL'} |",
    ]


def fmt_amp_table(rows):
    lines = ["| variable | median | mean ± std |", "|---|---|---|"]
    for v in ALL_VARS:
        med, mean, std = rows[v]
        lines.append(f"| {v} | {med:.3f} | {mean:.3f} ± {std:.3f} |")
    return lines


def judge_point(tab, label):
    """{var: (crit, melr, ssim, w2)} for all four variables."""
    return {v: judge(tab, label, v) for v in ALL_VARS}


def point_section(title, tab, amp_rows, gate_vars_pass=None):
    judged = judge_point(tab, title)
    lines = []
    for v in ALL_VARS:
        crit, melr, ssim, w2 = judged[v]
        status = "pass" if all(crit.values()) else "fail"
        tag = " (gating)" if gate_vars_pass is not None and v in GATE_VARS \
            else ""
        lines += [f"### {v} three-part criterion{tag} — {status}", ""]
        lines += fmt_judged(v, crit, melr, ssim, w2)
        lines.append("")
    lines += ["Amplitude ratios (treated ensemble):", ""]
    lines += fmt_amp_table(amp_rows)
    lines += ["", "CRPS (guided vs interp baseline):", "",
              "| variable | guided | interp |", "|---|---|---|"]
    for v in ALL_VARS:
        row = tab.get(("crps", v))
        if row is None:
            raise SystemExit(f"H9 verdict: {title}: missing crps row for {v}")
        interp = "n/a" if row["interp"] is None else f"{row['interp']:.4f}"
        lines.append(f"| {v} | {row['guided']:.4f} | {interp} |")
    lines.append("")
    return judged, lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point-a", required=True,
                    help="held-out-window eval dir (gating)")
    ap.add_argument("--point-b", default="",
                    help="H1-window seed-1 eval dir; empty = clock clause")
    ap.add_argument("--amplitude", required=True)
    ap.add_argument("--amp-a-key", required=True)
    ap.add_argument("--amp-b-key", default="")
    ap.add_argument("--bands", required=True)
    ap.add_argument("--out", default="docs/fidelity/meso128/H9_RESULT.md")
    args = ap.parse_args()

    amp = parse_amplitude(require(pathlib.Path(args.amplitude),
                                  "amplitude report"))
    amp_a = amp_section(amp, args.amp_a_key, "point A treated")
    bands_md = require(pathlib.Path(args.bands), "band diagnostic")

    a_fid = require(pathlib.Path(args.point_a) / "FIDELITY.md",
                    "point A eval")
    a_tab = parse_fidelity(a_fid)
    bands_have(bands_md, args.point_a)

    honest = all(AMP_LO <= amp_a[v][0] <= AMP_HI for v in GATE_VARS)
    a_judged, a_lines = point_section("point A", a_tab, amp_a,
                                      gate_vars_pass=True)
    gate = all(all(a_judged[v][0].values()) for v in GATE_VARS)

    if not honest:
        verdict = "VOID (amplitude-honesty precondition failed)"
    elif gate:
        verdict = "CONFIRMED"
    else:
        verdict = "NOT confirmed"

    lines = [
        f"# H9 result — {verdict}",
        "",
        "Confirmatory replication of H8 point C, executed exactly as",
        "pre-registered (`H9_PREREG.md`, committed before any guided",
        "sampling on the held-out window existed): archived 9.44Mi",
        "snapshot, pipeline byte-identical to H8 point C, held-out window",
        "2014-02-15-00 (49 h), fresh seed 1; gate = window-relative",
        "three-part criterion on uas AND vas; validity = treated median",
        f"amplitude ratio in [{AMP_LO}, {AMP_HI}] on both winds.",
        "",
        "## Validity precondition (amplitude honesty)",
        "",
        "| variable | median amplitude ratio | bound | verdict |",
        "|---|---|---|---|",
    ]
    for v in GATE_VARS:
        ok = AMP_LO <= amp_a[v][0] <= AMP_HI
        lines.append(
            f"| {v} | {amp_a[v][0]:.3f} | [{AMP_LO}, {AMP_HI}] "
            f"| {'honest' if ok else 'VOID'} |"
        )
    lines += ["", "## Point A (held-out window 2014-02-15-00, seed 1) — gating",
              ""]
    lines += a_lines

    lines += ["", "## Point B (H1 window 2014-01-07-00, seed 1) — "
              "registered secondary, NON-gating", ""]
    b_gate = None
    if not args.point_b:
        lines += ["NOT RUN (clock clause); shortfall stated per prereg.", ""]
    else:
        b_fid = require(pathlib.Path(args.point_b) / "FIDELITY.md",
                        "point B eval")
        b_tab = parse_fidelity(b_fid)
        bands_have(bands_md, args.point_b)
        amp_b = amp_section(amp, args.amp_b_key, "point B treated")
        b_judged, b_lines = point_section("point B", b_tab, amp_b)
        b_gate = all(all(b_judged[v][0].values()) for v in GATE_VARS)
        lines += b_lines

    if not honest:
        reading = (
            "the calibration behaved differently on this window's "
            "amplitude; audit the per-annulus gains before any "
            "re-register (no skill conclusion)."
        )
    elif gate:
        reading = (
            "the pipeline's wind skill is a property of the framework + "
            "snapshot, not of the tuning window or seed — the framework's "
            "first CONFIRMED passing spectral-fidelity setting at the "
            "reference's working geometry; update FIDELITY.md and the "
            "production recommendation."
        )
    elif b_gate:
        reading = (
            "window-specific skill: the climatological calibration fits "
            "some windows' spectra better than others; follow-up = "
            "window-stratified calibration audit; FIDELITY.md's claim "
            "stays qualified to the H1 window."
        )
    elif b_gate is None:
        reading = (
            "point A failed and point B did not run (clock clause): "
            "window-vs-seed attribution is OPEN; re-run point B before "
            "any mechanism claim."
        )
    else:
        reading = (
            "seed-fragile: H8 point C was an ensemble-seed fluctuation; "
            "follow-up = cross-seed variance analysis at fixed window."
        )
    lines += ["", f"**Reading (per the frozen map)**: {reading}", ""]

    out = pathlib.Path(args.out)
    out.write_text("\n".join(lines))
    print(f"H9 verdict: {verdict} -> {out}")


if __name__ == "__main__":
    main()
