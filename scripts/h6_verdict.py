"""Compose the pre-registered H6 verdict (docs/fidelity/meso128/H6_PREREG.md).

H6: t=0 band-limited data-consistency projection (point A: projection only;
point B: 0.1x COSMO gamma + projection; archived 9.44Mi snapshot, frozen H1
window) satisfies the FULL H1 uas criterion — (a) MELR < 1.3785,
(b) SSIM > 0.5256 and > 0.2641, (c) W2 < 4.3010 — at >= 1 of the two
registered points (open disjunction; the family never grows).

Mechanical, by-criterion. Hard-fails on missing declared artifacts
(VERDICT r4 next-step 5). Supports the clock clause: pass --point-b ''
(empty) to judge on point A alone with the shortfall stated.
"""

from __future__ import annotations

import argparse
import pathlib
import re

# Frozen bars, verbatim from H6_PREREG.md / eval_rows/cosmo.md.
BAR_MELR_INTERP = 1.3785
BAR_SSIM_INTERP = 0.5256
BAR_SSIM_UNCOND = 0.2641
BAR_W2_UNCOND = 4.3010
# vas key-secondary bars (frozen)
VAS_BARS = {"melr": 1.2785, "ssim_interp": 0.5898, "w2_uncond": 9.8820}

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
        raise SystemExit(f"H6 verdict: declared {what} missing: {path}")
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
        raise SystemExit(f"H6 verdict: no metric rows parsed from {fid_md}")
    return out


def judge_point(tab, label, var="uas", bars=None):
    bars = bars or {
        "melr": BAR_MELR_INTERP,
        "ssim_interp": BAR_SSIM_INTERP,
        "ssim_uncond": BAR_SSIM_UNCOND,
        "w2_uncond": BAR_W2_UNCOND,
    }
    need = [("melr", var), ("ssim", var), ("wasserstein", var)]
    for key in need:
        if key not in tab:
            raise SystemExit(f"H6 verdict: {label}: missing row {key}")
    melr = tab[("melr", var)]
    ssim = tab[("ssim", var)]
    w2 = tab[("wasserstein", var)]
    crit = {
        "a": melr["guided"] < bars["melr"],
        "b": ssim["guided"] > bars["ssim_interp"]
        and ssim["guided"] > bars.get("ssim_uncond", ssim["uncond"]),
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
            f"H6 verdict: no band rows for {eval_dir!r} in {bands_md}"
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point-a", required=True)
    ap.add_argument("--point-b", default="",
                    help="empty = clock clause: judge on point A alone")
    ap.add_argument("--bands", required=True)
    ap.add_argument("--out", default="docs/fidelity/meso128/H6_RESULT.md")
    args = ap.parse_args()

    bands_md = require(pathlib.Path(args.bands), "band diagnostic")
    points = [("A (projection only)", args.point_a)]
    if args.point_b:
        points.append(("B (0.1x COSMO gamma + projection)", args.point_b))

    results = []
    for label, d in points:
        fid = require(pathlib.Path(d) / "FIDELITY.md", f"point {label} eval")
        tab = parse_fidelity(fid)
        crit, melr, ssim, w2 = judge_point(tab, label)
        results.append((label, d, tab, crit, melr, ssim, w2))

    confirmed = any(all(crit.values()) for _, _, _, crit, *_ in results)
    verdict = "CONFIRMED" if confirmed else "NOT confirmed"

    lines = [
        f"# H6 result — {verdict}",
        "",
        "Protocol executed exactly as pre-registered (`H6_PREREG.md`,",
        "committed before any projected ensemble existed): two-point",
        "family (projection-only / light-guidance + projection), archived",
        "9.44Mi snapshot, frozen H1 window, gate = (a)∧(b)∧(c) on uas at",
        "≥1 point.",
        "",
    ]
    if not args.point_b:
        lines += [
            "> **Clock clause invoked**: the round ended before point B;",
            "> H6 is judged on point A alone (the family shrinks, never",
            "> grows).",
            "",
        ]

    for label, d, tab, crit, melr, ssim, w2 in results:
        passed = all(crit.values())
        lines += [
            f"## Point {label} — {'PASS' if passed else 'FAIL'}",
            "",
            "| criterion | bar | measured | verdict |",
            "|---|---|---|---|",
            f"| (a) projected uas MELR | < {BAR_MELR_INTERP} (interp) | "
            f"**{melr['guided']:.3f} ± {melr['gsem']:.3f}** | "
            f"{'pass' if crit['a'] else 'FAIL'} |",
            f"| (b) projected uas SSIM | > {BAR_SSIM_INTERP} (interp) and > "
            f"{BAR_SSIM_UNCOND} (uncond) | **{ssim['guided']:.3f}** | "
            f"{'pass' if crit['b'] else 'FAIL'} |",
            f"| (c) projected uas W2 | < {BAR_W2_UNCOND} (uncond) | "
            f"**{w2['guided']:.3f}** | "
            f"{'pass' if crit['c'] else 'FAIL'} |",
            "",
            f"Fresh-uncond comparison (this run's 8-sample control): "
            f"projected MELR {melr['guided']:.3f} vs uncond "
            f"{melr['uncond']:.3f} (Δ {melr['guided'] - melr['uncond']:+.3f}).",
            "",
        ]
        # vas key secondary (frozen bars; non-gating)
        vcrit, vmelr, vssim, vw2 = judge_point(
            tab, label, var="vas",
            bars={"melr": VAS_BARS["melr"],
                  "ssim_interp": VAS_BARS["ssim_interp"],
                  "ssim_uncond": 0.0142,
                  "w2_uncond": VAS_BARS["w2_uncond"]},
        )
        lines += [
            f"Key secondary — vas (expected-negative control, prereg): "
            f"MELR {vmelr['guided']:.3f} vs bar {VAS_BARS['melr']} "
            f"({'pass' if vcrit['a'] else 'fail, as predicted' }); "
            f"SSIM {vssim['guided']:.3f}; W2 {vw2['guided']:.3f}.",
            "",
            "Secondary rows (non-gating):",
            "",
            "| metric | variable | projected | fresh uncond |",
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
            "Band decomposition (REQUIRED artifact — the zero-injection "
            "claim, measured):",
            "",
            "| variable | source | obs-resolved | generative | grid-scale |",
            "|---|---|---|---|---|",
        ]
        lines += bands_section(bands_md, d)
        lines.append("")

    if confirmed:
        winners = [lab for lab, _, _, crit, *_ in results if all(crit.values())]
        reading = (
            "**Reading (per the frozen map)**: decoupling observation "
            "consistency from the sampling-time likelihood pin achieves "
            "the full H1 uas criterion at the reference's working geometry "
            f"— winning point(s): {', '.join(winners)}. VERDICT r4 "
            "weak-item 5 (no known setting achieves conditioning skill "
            "AND spectral parity) is resolved positively by formulation."
        )
    else:
        a_pass_b_fail = [
            r for r in results if r[3]["a"] and not r[3]["b"]
        ]
        a_fail = [r for r in results if not r[3]["a"]]
        if a_pass_b_fail and not any(r[3]["b"] for r in results):
            reading = (
                "**Reading (per the frozen map)**: the projection delivers "
                "the spectrum but exact coarse consistency plus "
                "realistic-but-misplaced texture loses SSIM's structure "
                "term to the smooth interpolation baseline — SSIM at this "
                "observation density rewards blur; Pareto position "
                "reported."
            )
        elif a_fail and len(a_fail) == len(results):
            reading = (
                "**Reading (per the frozen map)**: (a) failed at every "
                "point — the band-additivity estimate did not transfer or "
                "the projection perturbs the fine bands; the band rows "
                "above decide which, and the projection claim is falsified "
                "at production geometry (unit tests notwithstanding)."
            )
        else:
            reading = (
                "**Reading (per the frozen map)**: mixed criterion "
                "failures — see the per-point tables; the Pareto position "
                "of projection-only vs light-guidance+projection vs the "
                "committed COSMO point is the result."
            )
    lines += [reading, ""]

    out = pathlib.Path(args.out)
    out.write_text("\n".join(lines) + "\n")
    print(f"H6 verdict: {verdict} -> {out}")


if __name__ == "__main__":
    main()
