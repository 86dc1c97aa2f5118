"""Compose the pre-registered H5 verdict (docs/fidelity/meso128/H5_PREREG.md).

H5: gamma(t)-annealed guidance (t_rel in {0.3, 0.5}, COSMO sigma/gamma)
at the EXTENDED H3 snapshot satisfies the FULL H1 uas criterion with
conditioning active — (a) MELR < 1.3785 (frozen interp bar, a property
of the frozen window), (b) SSIM > 0.5256 (interp) and > the H3-eval
fresh-unconditional uas SSIM, (c) W2 < the H3-eval fresh-unconditional
uas W2 — at >= 1 of the two registered points (open disjunction; the
family never grows).

The unconditional bars are a RULE, not numbers: they are parsed from the
H3 final-eval table (--h3-eval), which the already-registered H3 protocol
produces before any H5 sample exists. vas is judged by the same rule
against its own frozen interp bars (1.2785 / 0.5898) as the pre-stated
key secondary — reported, non-gating.

Mechanical, by-criterion. Hard-fails on missing declared artifacts.
Supports the clock clause: pass --point-b '' to judge on point A alone.
"""

from __future__ import annotations

import argparse
import pathlib
import re

# Frozen window bars, verbatim from H5_PREREG.md / eval_rows/cosmo.md.
INTERP = {
    "uas": {"melr": 1.3785, "ssim": 0.5256},
    "vas": {"melr": 1.2785, "ssim": 0.5898},
}

ROW_RE = re.compile(
    r"^\|\s*(?P<metric>\w+)\s*\|\s*(?P<var>\w+)\s*\|"
    r"\s*(?P<guided>[-\d.]+)\s*±\s*(?P<gsem>[\d.]+)\s*\|"
    r"\s*(?P<uncond>[-\d.]+)\s*±\s*[\d.]+\s*\|"
)
BAND_ROW_RE = re.compile(
    r"^\|\s*(?P<var>\w+)\s*\|\s*(?P<src>[\w .]+?)\s*\|"
    r"\s*(?P<obs>[-\d.]+)\s*\|\s*(?P<gen>[-\d.]+)\s*\|\s*(?P<grid>[-\d.]+)\s*\|"
)


def require(path: pathlib.Path, what: str) -> pathlib.Path:
    if not path.exists():
        raise SystemExit(f"H5 verdict: declared {what} missing: {path}")
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
        raise SystemExit(f"H5 verdict: no metric rows parsed from {fid_md}")
    return out


def uncond_bars(h3_tab, var):
    """The rule-defined bars: H3-eval 24-sample unconditional SSIM / W2."""
    for key in (("ssim", var), ("wasserstein", var)):
        if key not in h3_tab:
            raise SystemExit(
                f"H5 verdict: H3-eval table lacks row {key} — the "
                "unconditional bar source is incomplete"
            )
    return {
        "ssim": h3_tab[("ssim", var)]["uncond"],
        "w2": h3_tab[("wasserstein", var)]["uncond"],
        "melr": h3_tab[("melr", var)]["uncond"]
        if ("melr", var) in h3_tab else None,
    }


def judge_var(tab, bars, var, label):
    need = [("melr", var), ("ssim", var), ("wasserstein", var)]
    for key in need:
        if key not in tab:
            raise SystemExit(f"H5 verdict: {label}: missing row {key}")
    melr = tab[("melr", var)]
    ssim = tab[("ssim", var)]
    w2 = tab[("wasserstein", var)]
    crit = {
        "a": melr["guided"] < INTERP[var]["melr"],
        "b": ssim["guided"] > INTERP[var]["ssim"]
        and ssim["guided"] > bars["ssim"],
        "c": w2["guided"] < bars["w2"],
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
            f"H5 verdict: no band rows for {eval_dir!r} in {bands_md}"
        )
    return rows


def var_block(label, var, crit, melr, ssim, w2, bars, gating):
    passed = all(crit.values())
    tag = "PASS" if passed else "FAIL"
    head = (f"## Point {label} — {tag}" if gating
            else f"### Point {label}, vas secondary — {tag} (non-gating)")
    return passed, [
        head,
        "",
        "| criterion | bar | measured | verdict |",
        "|---|---|---|---|",
        f"| (a) guided {var} MELR | < {INTERP[var]['melr']} (interp, frozen) "
        f"| **{melr['guided']:.3f} ± {melr['gsem']:.3f}** | "
        f"{'pass' if crit['a'] else 'FAIL'} |",
        f"| (b) guided {var} SSIM | > {INTERP[var]['ssim']} (interp) and > "
        f"{bars['ssim']:.4f} (H3-eval uncond) | **{ssim['guided']:.3f}** | "
        f"{'pass' if crit['b'] else 'FAIL'} |",
        f"| (c) guided {var} W2 | < {bars['w2']:.4f} (H3-eval uncond) | "
        f"**{w2['guided']:.3f}** | {'pass' if crit['c'] else 'FAIL'} |",
        "",
        f"Fresh-uncond comparison (this run's 8-sample control): guided "
        f"MELR {melr['guided']:.3f} vs uncond {melr['uncond']:.3f} "
        f"(Δ {melr['guided'] - melr['uncond']:+.3f}).",
        "",
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point-a", required=True)
    ap.add_argument("--point-b", default="",
                    help="empty = clock clause: judge on point A alone")
    ap.add_argument("--bands", required=True)
    ap.add_argument("--h3-eval", required=True,
                    help="H3 final-eval dir: the unconditional-bar source")
    ap.add_argument("--snapshot-kdata", type=int, default=0,
                    help="recorded; 0 = unknown")
    ap.add_argument("--out", default="docs/fidelity/meso128/H5_RESULT.md")
    args = ap.parse_args()

    bands_md = require(pathlib.Path(args.bands), "band diagnostic")
    h3_fid = require(
        pathlib.Path(args.h3_eval) / "FIDELITY.md",
        "H3 final-eval table (unconditional-bar source)",
    )
    h3_tab = parse_fidelity(h3_fid)
    bars_uas = uncond_bars(h3_tab, "uas")
    bars_vas = uncond_bars(h3_tab, "vas")

    points = [("A (t_rel=0.3)", args.point_a)]
    if args.point_b:
        points.append(("B (t_rel=0.5)", args.point_b))

    results = []
    for label, d in points:
        fid = require(pathlib.Path(d) / "FIDELITY.md", f"point {label} eval")
        tab = parse_fidelity(fid)
        results.append((label, d, tab))

    lines = []
    uas_passes, vas_passes = [], []
    body = []
    for label, d, tab in results:
        crit, melr, ssim, w2 = judge_var(tab, bars_uas, "uas", label)
        p, blk = var_block(label, "uas", crit, melr, ssim, w2, bars_uas, True)
        uas_passes.append((label, crit, melr))
        body += blk
        vcrit, vmelr, vssim, vw2 = judge_var(tab, bars_vas, "vas", label)
        vp, vblk = var_block(
            label, "vas", vcrit, vmelr, vssim, vw2, bars_vas, False)
        vas_passes.append((label, vcrit, vmelr))
        body += vblk
        body += [
            "Secondary rows (non-gating):",
            "",
            "| metric | variable | guided | fresh uncond |",
            "|---|---|---|---|",
        ]
        for mtr in ("melr", "ssim", "wasserstein"):
            for v in ("uas", "vas", "tas", "psl"):
                if (mtr, v) in tab:
                    r = tab[(mtr, v)]
                    body.append(f"| {mtr} | {v} | {r['guided']:.3f} | "
                                f"{r['uncond']:.3f} |")
        body += [
            "",
            "Band decomposition (REQUIRED artifact):",
            "",
            "| variable | source | obs-resolved | generative | grid-scale |",
            "|---|---|---|---|---|",
        ]
        body += bands_section(bands_md, d)
        body.append("")

    confirmed = any(all(c.values()) for _, c, _ in uas_passes)
    verdict = "CONFIRMED" if confirmed else "NOT confirmed"
    vas_conf = any(all(c.values()) for _, c, _ in vas_passes)

    lines += [
        f"# H5 result — {verdict}",
        "",
        "Protocol executed exactly as pre-registered (`H5_PREREG.md`,",
        "committed while the H3 extension was still training): two-point",
        "family, COSMO hyperparameters, extended snapshot"
        + (f" ({args.snapshot_kdata}Ki)" if args.snapshot_kdata else ""),
        "frozen H1 window, gate = (a)∧(b)∧(c) on uas at ≥1 point;",
        "unconditional bars taken from the H3-eval 24-sample control per",
        "the registered rule.",
        "",
        f"vas secondary (pre-stated, non-gating): "
        f"{'PASSES' if vas_conf else 'does not pass'} its own three-part "
        "criterion at ≥1 point.",
        "",
    ]
    if not args.point_b:
        lines += [
            "> **Clock clause invoked**: the round ended before point B;",
            "> H5 is judged on point A alone (the family shrinks, never",
            "> grows).",
            "",
        ]
    lines += body

    # interpretation-map branch (mechanical: thresholds from the prereg)
    uncond_above_bar = (
        bars_uas["melr"] is not None
        and bars_uas["melr"] > INTERP["uas"]["melr"]
    )
    a_fails = [(lbl, c, m) for lbl, c, m in uas_passes if not c["a"]]
    if confirmed:
        reading = (
            "**Reading (per the frozen map)**: budget + release together "
            "achieve guided spectral fidelity with active conditioning at "
            "the reference's working geometry on uas — VERDICT r4 "
            "weak-item 5 is resolved positively, with the winning setting "
            "named above."
        )
    elif a_fails and all(
        abs(m["guided"] - m["uncond"]) <= 0.1 for _, _, m in a_fails
    ) and uncond_above_bar:
        reading = (
            "**Reading (per the frozen map)**: release works spectrally "
            "(guided ≈ fresh uncond within 0.1) but the unconditional "
            "spectrum still sits above the bar at the extended snapshot — "
            "the model spectrum remains the binding constraint at 13.6Mi; "
            "H3's measured Δ per +4.19Mi quantifies the remaining budget "
            "distance (extrapolation recorded, not claimed)."
        )
    elif a_fails and any(
        m["guided"] > m["uncond"] + 0.1 for _, _, m in a_fails
    ):
        reading = (
            "**Reading (per the frozen map)**: guided MELR stays > fresh "
            "uncond + 0.1 — annealed release is insufficient at the "
            "extended snapshot too. Recorded next designs: x̂₀-space "
            "guidance; t=0 data-consistency projection (not run)."
        )
    elif a_fails:
        reading = (
            "**Reading**: guided MELR ≈ fresh uncond but the uncond/bar "
            "relation straddles sampling noise — neither map branch fires "
            "cleanly; the per-point Δ values above carry the evidence."
        )
    else:
        reading = (
            "**Reading (per the frozen map)**: (a) passed but conditioning "
            "was traded away ((b) or (c) failed) — the release is a Pareto "
            "dial, not a win, at this snapshot."
        )
    lines += [reading, ""]

    out = pathlib.Path(args.out)
    out.write_text("\n".join(lines) + "\n")
    print(f"H5 verdict: {verdict} -> {out}")


if __name__ == "__main__":
    main()
