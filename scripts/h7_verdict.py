"""Compose the pre-registered H7 verdict (docs/fidelity/meso128/H7_PREREG.md).

H7: climatological spectral calibration + t=0 projection (point A:
guidance off; point B: COSMO guidance; archived 9.44Mi snapshot, frozen H1
window) satisfies the FULL H1 uas criterion — (a) MELR < 1.3785,
(b) SSIM > 0.5256 and > 0.2641, (c) W2 < 4.3010 — at >= 1 of the two
registered points. Key secondary: the same three-part criterion on vas
(MELR < 1.2785, SSIM > 0.5898 and > 0.0142, W2 < 9.8820), reported either
way.

Mechanical, by-criterion. Hard-fails on missing declared artifacts.
Supports the clock clause: pass --point-b '' to judge on point A alone.
"""

from __future__ import annotations

import argparse
import pathlib
import re

UAS_BARS = {"melr": 1.3785, "ssim_interp": 0.5256, "ssim_uncond": 0.2641,
            "w2_uncond": 4.3010}
VAS_BARS = {"melr": 1.2785, "ssim_interp": 0.5898, "ssim_uncond": 0.0142,
            "w2_uncond": 9.8820}

ROW_RE = re.compile(
    r"^\|\s*(?P<metric>\w+)\s*\|\s*(?P<var>\w+)\s*\|"
    r"\s*(?P<guided>[-\d.]+)\s*±\s*(?P<gsem>[\d.]+)\s*\|"
    r"\s*(?P<uncond>[-\d.]+)\s*±\s*[\d.]+\s*\|"
    r"\s*(?P<base>[-\d.n/a]+)"
)
BAND_ROW_RE = re.compile(
    r"^\|\s*(?P<var>\w+)\s*\|\s*(?P<src>[\w .]+?)\s*\|"
    r"\s*(?P<obs>[-\d.]+)\s*\|\s*(?P<gen>[-\d.]+)\s*\|\s*(?P<grid>[-\d.]+)\s*\|"
)


def require(path: pathlib.Path, what: str) -> pathlib.Path:
    if not path.exists():
        raise SystemExit(f"H7 verdict: declared {what} missing: {path}")
    return path


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
        raise SystemExit(f"H7 verdict: no metric rows parsed from {fid_md}")
    return out


def judge(tab, label, var, bars):
    need = [("melr", var), ("ssim", var), ("wasserstein", var)]
    for key in need:
        if key not in tab:
            raise SystemExit(f"H7 verdict: {label}: missing row {key}")
    melr, ssim, w2 = (tab[k] for k in need)
    crit = {
        "a": melr["guided"] < bars["melr"],
        "b": ssim["guided"] > bars["ssim_interp"]
        and ssim["guided"] > bars["ssim_uncond"],
        "c": w2["guided"] < bars["w2_uncond"],
    }
    return crit, melr, ssim, w2


def bands_section(bands_md: pathlib.Path, eval_dir: str):
    rows, in_sec = [], False
    for line in bands_md.read_text().splitlines():
        if line.startswith("## "):
            in_sec = line[3:].strip().rstrip("/") == eval_dir.rstrip("/")
            continue
        if in_sec and BAND_ROW_RE.match(line.strip()):
            rows.append(line.strip())
    if not rows:
        raise SystemExit(
            f"H7 verdict: no band rows for {eval_dir!r} in {bands_md}"
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point-a", required=True)
    ap.add_argument("--point-b", default="",
                    help="empty = clock clause: judge on point A alone")
    ap.add_argument("--bands", required=True)
    ap.add_argument("--out", default="docs/fidelity/meso128/H7_RESULT.md")
    args = ap.parse_args()

    bands_md = require(pathlib.Path(args.bands), "band diagnostic")
    points = [("A (calibration + projection, guidance off)", args.point_a)]
    if args.point_b:
        points.append(("B (COSMO guidance + calibration + projection)",
                       args.point_b))

    results = []
    for label, d in points:
        fid = require(pathlib.Path(d) / "FIDELITY.md", f"point {label} eval")
        tab = parse_fidelity(fid)
        crit, melr, ssim, w2 = judge(tab, label, "uas", UAS_BARS)
        vcrit, vmelr, vssim, vw2 = judge(tab, label, "vas", VAS_BARS)
        results.append((label, d, tab, crit, melr, ssim, w2,
                        vcrit, vmelr, vssim, vw2))

    confirmed = any(all(r[3].values()) for r in results)
    vas_pass = any(all(r[7].values()) for r in results)
    verdict = "CONFIRMED" if confirmed else "NOT confirmed"

    lines = [
        f"# H7 result — {verdict}",
        "",
        "Protocol executed exactly as pre-registered (`H7_PREREG.md`,",
        "committed before any calibrated ensemble existed): two-point",
        "family, archived 9.44Mi snapshot, frozen H1 window, gate =",
        "(a)∧(b)∧(c) on uas at ≥1 point; vas three-part criterion as the",
        "pre-stated key secondary.",
        "",
    ]
    if not args.point_b:
        lines += [
            "> **Clock clause invoked**: the round ended before point B;",
            "> H7 is judged on point A alone (the family shrinks, never",
            "> grows).",
            "",
        ]

    for (label, d, tab, crit, melr, ssim, w2,
         vcrit, vmelr, vssim, vw2) in results:
        passed = all(crit.values())
        lines += [
            f"## Point {label} — {'PASS' if passed else 'FAIL'}",
            "",
            "| criterion | bar | measured | verdict |",
            "|---|---|---|---|",
            f"| (a) uas MELR | < {UAS_BARS['melr']} (interp) | "
            f"**{melr['guided']:.3f} ± {melr['gsem']:.3f}** | "
            f"{'pass' if crit['a'] else 'FAIL'} |",
            f"| (b) uas SSIM | > {UAS_BARS['ssim_interp']} (interp) and > "
            f"{UAS_BARS['ssim_uncond']} (uncond) | **{ssim['guided']:.3f}** | "
            f"{'pass' if crit['b'] else 'FAIL'} |",
            f"| (c) uas W2 | < {UAS_BARS['w2_uncond']} (uncond) | "
            f"**{w2['guided']:.3f}** | "
            f"{'pass' if crit['c'] else 'FAIL'} |",
            "",
            f"vas key secondary — {'PASS' if all(vcrit.values()) else 'fail'}: "
            f"MELR {vmelr['guided']:.3f} (< {VAS_BARS['melr']}: "
            f"{'yes' if vcrit['a'] else 'no'}), "
            f"SSIM {vssim['guided']:.3f} (> {VAS_BARS['ssim_interp']}: "
            f"{'yes' if vcrit['b'] else 'no'}), "
            f"W2 {vw2['guided']:.3f} (< {VAS_BARS['w2_uncond']}: "
            f"{'yes' if vcrit['c'] else 'no'}).",
            "",
            "Secondary rows (non-gating):",
            "",
            "| metric | variable | treated | fresh uncond |",
            "|---|---|---|---|",
        ]
        for mtr in ("melr", "ssim", "wasserstein"):
            for v in ("uas", "vas", "tas", "psl"):
                if (mtr, v) in tab:
                    r = tab[(mtr, v)]
                    lines.append(
                        f"| {mtr} | {v} | {r['guided']:.3f} | "
                        f"{r['uncond']:.3f} |"
                    )
        lines += [
            "",
            "Band decomposition (REQUIRED artifact):",
            "",
            "| variable | source | obs-resolved | generative | grid-scale |",
            "|---|---|---|---|---|",
        ]
        lines += bands_section(bands_md, d)
        lines.append("")

    if confirmed:
        winners = [r[0] for r in results if all(r[3].values())]
        reading = (
            "**Reading (per the frozen map)**: the framework demonstrates "
            "guided downscaling at the reference's working geometry that "
            "beats the interpolated-observation baseline on spectrum WITH "
            "active conditioning — VERDICT r4 weak-item 5 resolved "
            f"positively. Winning point(s): {', '.join(winners)}; pipeline "
            "= sampling → [guidance] → climatological spectral calibration "
            "→ t=0 band-limited projection."
            + (" The vas key secondary ALSO passes: the H1 vas cell — "
               "called budget-limited by the H1 mechanism analysis — is "
               "resolved by formulation instead." if vas_pass else "")
        )
    else:
        a_fail = [r for r in results if not r[3]["a"]]
        if a_fail and len(a_fail) == len(results):
            reading = (
                "**Reading (per the frozen map)**: (a) failed everywhere — "
                "the by-construction argument broke (train/eval "
                "climatology mismatch or the in-square/annulus seam); the "
                "band rows decide, and the residual bounds how much of "
                "MELR is NOT amplitude."
            )
        else:
            reading = (
                "**Reading (per the frozen map)**: the spectrum is fixed "
                "but skill/distribution constraints failed where marked — "
                "spectrum, skill, and distribution could not be held "
                "simultaneously; weak-item 5 stands with the "
                "strongest-known negative evidence."
            )
    lines += [reading, ""]

    out = pathlib.Path(args.out)
    out.write_text("\n".join(lines) + "\n")
    print(f"H7 verdict: {verdict} -> {out}")


if __name__ == "__main__":
    main()
