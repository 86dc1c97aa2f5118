"""Compose the pre-registered H8 verdict (docs/fidelity/meso128/H8_PREREG.md).

H8: the absolute-amplitude miscalibration is solver-mediated — at the
archived 9.44Mi snapshot on the frozen H1 window, unconditional
DPM++(2M)-64 SDE eta=0.3 sampling brings the median per-frame amplitude
ratio (sample std / truth std) below 2.0 on uas AND vas.

Validity precondition: the same instrument over the SAVED deterministic
control must read >= 2.5 on both winds (reproducing H6's measurement),
else the gate is VOID.

Registered secondaries: tas/psl ratios; point-A uniform MELR vs the
committed deterministic values; points B/C against the H1 three-part
criteria (non-gating); B/C amplitude ratios; band decomposition.

Mechanical, by-criterion. Hard-fails on missing declared artifacts.
Clock clause: --point-b/--point-c may be empty if the round ended
mid-chain; the shortfall is stated.
"""

from __future__ import annotations

import argparse
import pathlib
import re

GATE_BAR = 2.0
CONTROL_BAR = 2.5
# committed deterministic 24-sample unconditional uniform MELR
# (docs/fidelity/meso128/FIDELITY.md uncond column)
DPM_UNCOND_MELR = {"psl": 9.984, "tas": 6.654, "uas": 1.348, "vas": 2.000}
UAS_BARS = {"melr": 1.3785, "ssim_interp": 0.5256, "ssim_uncond": 0.2641,
            "w2_uncond": 4.3010}
VAS_BARS = {"melr": 1.2785, "ssim_interp": 0.5898, "ssim_uncond": 0.0142,
            "w2_uncond": 9.8820}

ROW_RE = re.compile(
    r"^\|\s*(?P<metric>\w+)\s*\|\s*(?P<var>\w+)\s*\|"
    r"\s*(?P<guided>[-\d.]+)\s*±\s*(?P<gsem>[\d.]+)\s*\|"
    r"\s*(?P<uncond>[-\d.]+)\s*±\s*[\d.]+\s*\|"
)
AMP_ROW_RE = re.compile(
    r"^\|\s*(?P<var>\w+)\s*\|\s*(?P<median>[\d.]+)\s*\|"
    r"\s*(?P<mean>[\d.]+)\s*±\s*(?P<std>[\d.]+)\s*\|"
)
BAND_ROW_RE = re.compile(r"^\|\s*\w+\s*\|\s*[\w .]+?\s*\|\s*[-\d.]+\s*\|")


def require(path: pathlib.Path, what: str) -> pathlib.Path:
    if not path.exists():
        raise SystemExit(f"H8 verdict: declared {what} missing: {path}")
    return path


def parse_amplitude(md: pathlib.Path):
    """{section-dir: {var: (median, mean, std)}} from amplitude_ratio.py."""
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
        raise SystemExit(f"H8 verdict: no amplitude sections in {md}")
    return out


def amp_section(amp, key, what):
    for sec, rows in amp.items():
        if sec.rstrip("/") == key.rstrip("/"):
            for v in ("psl", "tas", "uas", "vas"):
                if v not in rows:
                    raise SystemExit(
                        f"H8 verdict: {what}: missing variable {v} in "
                        f"amplitude section {sec!r}"
                    )
            return rows
    raise SystemExit(
        f"H8 verdict: amplitude report has no section {key!r} ({what}); "
        f"sections: {sorted(amp)}"
    )


def parse_fidelity(fid_md: pathlib.Path):
    out = {}
    for line in fid_md.read_text().splitlines():
        m = ROW_RE.match(line.strip())
        if m:
            out[(m.group("metric"), m.group("var"))] = {
                "guided": float(m.group("guided")),
                "gsem": float(m.group("gsem")),
                "uncond": float(m.group("uncond")),
            }
    if not out:
        raise SystemExit(f"H8 verdict: no metric rows parsed from {fid_md}")
    return out


def judge_h1(tab, label, var, bars):
    need = [("melr", var), ("ssim", var), ("wasserstein", var)]
    for key in need:
        if key not in tab:
            raise SystemExit(f"H8 verdict: {label}: missing row {key}")
    melr, ssim, w2 = (tab[k] for k in need)
    crit = {
        "a": melr["guided"] < bars["melr"],
        "b": ssim["guided"] > bars["ssim_interp"]
        and ssim["guided"] > bars["ssim_uncond"],
        "c": w2["guided"] < bars["w2_uncond"],
    }
    return crit, melr, ssim, w2


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
            f"H8 verdict: no band rows for {eval_dir!r} in {bands_md}"
        )


def fmt_amp_table(rows):
    lines = ["| variable | median | mean ± std |", "|---|---|---|"]
    for v in ("psl", "tas", "uas", "vas"):
        med, mean, std = rows[v]
        lines.append(f"| {v} | {med:.3f} | {mean:.3f} ± {std:.3f} |")
    return lines


def fmt_h1_table(var, crit, melr, ssim, w2, bars):
    return [
        "| criterion | bar | measured | verdict |",
        "|---|---|---|---|",
        f"| (a) {var} MELR | < {bars['melr']} (interp, frozen) "
        f"| {melr['guided']:.3f} ± {melr['gsem']:.3f} "
        f"| {'pass' if crit['a'] else 'FAIL'} |",
        f"| (b) {var} SSIM (protocol conv.) | > {bars['ssim_interp']} and "
        f"> {bars['ssim_uncond']} | {ssim['guided']:.3f} "
        f"| {'pass' if crit['b'] else 'FAIL'} |",
        f"| (c) {var} W2 | < {bars['w2_uncond']} (uncond, frozen) "
        f"| {w2['guided']:.3f} | {'pass' if crit['c'] else 'FAIL'} |",
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amplitude", required=True,
                    help="amplitude_ratio.py report covering all sections")
    ap.add_argument("--treated-key", required=True,
                    help="amplitude section for point A's treated ensemble")
    ap.add_argument("--control-key", required=True,
                    help="amplitude section for the saved deterministic control")
    ap.add_argument("--point-a", required=True,
                    help="point A eval dir (FIDELITY.md read for MELR rows)")
    ap.add_argument("--point-b", default="",
                    help="empty = clock clause: point B did not run")
    ap.add_argument("--point-c", default="")
    ap.add_argument("--amp-b-key", default="")
    ap.add_argument("--amp-c-key", default="")
    ap.add_argument("--bands", required=True)
    ap.add_argument("--out", default="docs/fidelity/meso128/H8_RESULT.md")
    args = ap.parse_args()

    amp = parse_amplitude(require(pathlib.Path(args.amplitude),
                                  "amplitude report"))
    treated = amp_section(amp, args.treated_key, "point A treated")
    control = amp_section(amp, args.control_key, "deterministic control")
    bands_md = require(pathlib.Path(args.bands), "band diagnostic")

    a_fid = require(pathlib.Path(args.point_a) / "FIDELITY.md",
                    "point A eval")
    a_tab = parse_fidelity(a_fid)
    bands_have(bands_md, args.point_a)

    valid = control["uas"][0] >= CONTROL_BAR and control["vas"][0] >= CONTROL_BAR
    gate = treated["uas"][0] < GATE_BAR and treated["vas"][0] < GATE_BAR

    if not valid:
        verdict = "VOID (validity precondition failed)"
    elif gate:
        verdict = "CONFIRMED"
    else:
        verdict = "NOT confirmed"

    lines = [
        f"# H8 result — {verdict}",
        "",
        "Protocol executed exactly as pre-registered (`H8_PREREG.md`,",
        "committed before any SDE-unconditional amplitude measurement at",
        "128² existed): archived 9.44Mi snapshot, frozen H1 window,",
        "DPM++(2M)-64 SDE η=0.3; gate = median per-frame amplitude ratio",
        f"< {GATE_BAR} on uas AND vas at point A, valid only if the saved",
        f"deterministic control reads ≥ {CONTROL_BAR} on both winds.",
        "",
        "## Gate (point A: unconditional SDE η=0.3, 24 samples)",
        "",
        "| quantity | uas | vas | bar | verdict |",
        "|---|---|---|---|---|",
        f"| deterministic control median ratio | {control['uas'][0]:.3f} "
        f"| {control['vas'][0]:.3f} | ≥ {CONTROL_BAR} (validity) "
        f"| {'valid' if valid else 'VOID'} |",
        f"| SDE treated median ratio | {treated['uas'][0]:.3f} "
        f"| {treated['vas'][0]:.3f} | < {GATE_BAR} "
        f"| {'pass' if gate else 'FAIL'} |",
        "",
        "### Point A amplitude (all variables)",
        "",
    ]
    lines += fmt_amp_table(treated)
    lines += ["", "### Deterministic control amplitude (saved H7 uncond)", ""]
    lines += fmt_amp_table(control)

    lines += [
        "",
        "## Registered secondary: point A uniform MELR vs committed deterministic",
        "",
        "| variable | SDE uncond (this run) | DPM uncond (committed) |",
        "|---|---|---|",
    ]
    for v in ("psl", "tas", "uas", "vas"):
        key = ("melr", v)
        if key not in a_tab:
            raise SystemExit(f"H8 verdict: point A: missing row {key}")
        lines.append(
            f"| {v} | {a_tab[key]['guided']:.3f} | {DPM_UNCOND_MELR[v]:.3f} |"
        )

    for label, d, amp_key in (
        ("B (COSMO guidance + SDE + projection, no calibration)",
         args.point_b, args.amp_b_key),
        ("C (COSMO guidance + SDE + calibration + projection)",
         args.point_c, args.amp_c_key),
    ):
        lines += ["", f"## Point {label} — registered secondary, NON-gating", ""]
        if not d:
            lines += ["NOT RUN (clock clause); shortfall stated per prereg.", ""]
            continue
        fid = require(pathlib.Path(d) / "FIDELITY.md", f"point {label} eval")
        tab = parse_fidelity(fid)
        bands_have(bands_md, d)
        for var, bars in (("uas", UAS_BARS), ("vas", VAS_BARS)):
            crit, melr, ssim, w2 = judge_h1(tab, label, var, bars)
            status = "pass" if all(crit.values()) else "fail"
            lines += [f"### {var} three-part criterion — {status}", ""]
            lines += fmt_h1_table(var, crit, melr, ssim, w2, bars)
            lines.append("")
        if amp_key:
            rows = amp_section(amp, amp_key, f"point {label} amplitude")
            lines += ["Amplitude ratios (treated ensemble):", ""]
            lines += fmt_amp_table(rows)
            lines.append("")

    lines += [
        "",
        "**Reading (per the frozen map)**: "
        + (
            "the amplitude defect is a deterministic-ODE artifact at this "
            "budget, not a model property — correct the H6/H7/FIDELITY "
            "mechanism attributions; spectral-fidelity workloads should "
            "sample with SDE η=0.3."
            if (valid and gate)
            else (
                "the amplitude defect survives ancestral re-noising — "
                "model-mediated (score-magnitude miscalibration); H7's "
                "attribution stands, tested from both sides; climatological "
                "calibration remains required at this training budget."
                if valid
                else "instrument inconsistent with H6's measurement; no "
                "mechanism conclusion — fix the instrument and re-register."
            )
        ),
        "",
    ]

    out = pathlib.Path(args.out)
    out.write_text("\n".join(lines))
    print(f"H8 verdict: {verdict} -> {out}")


if __name__ == "__main__":
    main()
