"""Compose the pre-registered H4 verdict (docs/fidelity/meso128/H4_PREREG.md).

H4: gamma(t)-annealed guidance (t_rel in {0.3, 0.5}, COSMO sigma/gamma,
archived 9.44Mi snapshot, frozen H1 window) satisfies the FULL H1 uas
criterion with conditioning active — (a) MELR < 1.3785, (b) SSIM > 0.5256
and > 0.2641, (c) W2 < 4.3010 — at at least one of the two registered
points (open two-point disjunction; the family never grows).

Mechanical, by-criterion. Hard-fails on missing declared artifacts
(VERDICT r4 next-step 5). Supports the clock clause: pass --point-b ''
(empty) to judge on point A alone with the shortfall stated.
"""

from __future__ import annotations

import argparse
import pathlib
import re

# Frozen bars, verbatim from H4_PREREG.md / eval_rows/cosmo.md.
BAR_MELR_INTERP = 1.3785
BAR_SSIM_INTERP = 0.5256
BAR_SSIM_UNCOND = 0.2641
BAR_W2_UNCOND = 4.3010

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
        raise SystemExit(f"H4 verdict: declared {what} missing: {path}")
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
        raise SystemExit(f"H4 verdict: no metric rows parsed from {fid_md}")
    return out


def judge_point(tab, label):
    need = [("melr", "uas"), ("ssim", "uas"), ("wasserstein", "uas")]
    for key in need:
        if key not in tab:
            raise SystemExit(f"H4 verdict: {label}: missing row {key}")
    melr = tab[("melr", "uas")]
    ssim = tab[("ssim", "uas")]
    w2 = tab[("wasserstein", "uas")]
    crit = {
        "a (MELR < interp 1.3785)": melr["guided"] < BAR_MELR_INTERP,
        "b (SSIM > interp 0.5256 and > uncond 0.2641)":
            ssim["guided"] > BAR_SSIM_INTERP
            and ssim["guided"] > BAR_SSIM_UNCOND,
        "c (W2 < uncond 4.3010)": w2["guided"] < BAR_W2_UNCOND,
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
            f"H4 verdict: no band rows for {eval_dir!r} in {bands_md}"
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point-a", required=True)
    ap.add_argument("--point-b", default="",
                    help="empty = clock clause: judge on point A alone")
    ap.add_argument("--bands", required=True)
    ap.add_argument("--out", default="docs/fidelity/meso128/H4_RESULT.md")
    args = ap.parse_args()

    bands_md = require(pathlib.Path(args.bands), "band diagnostic")
    points = [("A (t_rel=0.3)", args.point_a)]
    if args.point_b:
        points.append(("B (t_rel=0.5)", args.point_b))

    results = []
    for label, d in points:
        fid = require(pathlib.Path(d) / "FIDELITY.md", f"point {label} eval")
        tab = parse_fidelity(fid)
        crit, melr, ssim, w2 = judge_point(tab, label)
        results.append((label, d, tab, crit, melr, ssim, w2))

    confirmed = any(all(crit.values()) for _, _, _, crit, *_ in results)
    verdict = "CONFIRMED" if confirmed else "NOT confirmed"

    lines = [
        f"# H4 result — {verdict}",
        "",
        "Protocol executed exactly as pre-registered (`H4_PREREG.md`,",
        "committed before any annealed ensemble was sampled): two-point",
        "family, COSMO hyperparameters, archived 9.44Mi snapshot, frozen",
        "H1 window, gate = (a)∧(b)∧(c) on uas at ≥1 point.",
        "",
    ]
    if not args.point_b:
        lines += [
            "> **Clock clause invoked**: the round ended before point B;",
            "> H4 is judged on point A alone (the family shrinks, never",
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
            f"| (a) guided uas MELR | < {BAR_MELR_INTERP} (interp) | "
            f"**{melr['guided']:.3f} ± {melr['gsem']:.3f}** | "
            f"{'pass' if crit['a (MELR < interp 1.3785)'] else 'FAIL'} |",
            f"| (b) guided uas SSIM | > {BAR_SSIM_INTERP} (interp) and > "
            f"{BAR_SSIM_UNCOND} (uncond) | **{ssim['guided']:.3f}** | "
            f"{'pass' if crit['b (SSIM > interp 0.5256 and > uncond 0.2641)'] else 'FAIL'} |",
            f"| (c) guided uas W2 | < {BAR_W2_UNCOND} (uncond) | "
            f"**{w2['guided']:.3f}** | "
            f"{'pass' if crit['c (W2 < uncond 4.3010)'] else 'FAIL'} |",
            "",
            f"Fresh-uncond comparison (this run's 8-sample control): guided "
            f"MELR {melr['guided']:.3f} vs uncond {melr['uncond']:.3f} "
            f"(Δ {melr['guided'] - melr['uncond']:+.3f}).",
            "",
            "Secondary rows (non-gating):",
            "",
            "| metric | variable | guided | fresh uncond |",
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

    # interpretation-map branch (mechanical: thresholds from the prereg)
    if confirmed:
        reading = (
            "**Reading (per the frozen map)**: the late-time injection is "
            "releasable — the framework demonstrates guided spectral "
            "fidelity with active conditioning at the reference's working "
            "geometry on uas; the H1 uas cell is winnable by formulation."
        )
    else:
        a_fails = [r for r in results if not r[3]["a (MELR < interp 1.3785)"]]
        if a_fails and all(
            abs(r[4]["guided"] - r[4]["uncond"]) <= 0.1 for r in a_fails
        ):
            reading = (
                "**Reading (per the frozen map)**: release works spectrally "
                "(guided ≈ fresh uncond within 0.1) but the unconditional "
                "spectrum itself sits above the bar at this snapshot/draw — "
                "the binding constraint is the model spectrum (H3's "
                "question), not the formulation."
            )
        elif a_fails:
            reading = (
                "**Reading (per the frozen map)**: guided MELR stays > "
                "fresh uncond + 0.1 — injected power from the still-pinned "
                "early/mid steps persists through the remaining flow; "
                "annealing is insufficient. Next designs (recorded, not "
                "run): x̂₀-space guidance; t=0 data-consistency projection."
            )
        else:
            reading = (
                "**Reading (per the frozen map)**: (a) passed but "
                "conditioning was traded away ((b) or (c) failed) — the "
                "release is a Pareto dial, not a win at these t_rel."
            )
    lines += [reading, ""]

    out = pathlib.Path(args.out)
    out.write_text("\n".join(lines) + "\n")
    print(f"H4 verdict: {verdict} -> {out}")


if __name__ == "__main__":
    main()
