"""Scored likelihood-hyperparameter sweep (VERDICT r3 next-step 2).

``exp.downscaling.sweep_likelihood_hparams`` generates trial ensembles but
never scores them; this driver closes the loop: for each (sigma, gamma)
trial it generates the evaluation ensemble, runs the full metrics suite,
and appends a scored JSONL row, ending with a ranked summary table.

Protocol (anchored to the reference's tuning tool,
exp/downscaling.py:290-321, which exists because the published (sigma,
gamma) were tuned per-dataset on COSMO):

  * trial 0 is the reference's COSMO-tuned point (the round-3 eval config)
    so every other trial reads as a paired improvement/regression;
  * trials 1..N re-seed and draw from the published log-uniform search
    space via ``_draw_likelihood_hparams``;
  * all trials share the sampling seed, so ensembles differ only through
    the guidance hyperparameters (paired comparison);
  * score (lower = better) =
        log(mean_v W2_v/W2_interp_v) + log(mean_v MELR_v/MELR_interp_v)
        +  mean_v |log spread_skill_v|
    i.e. distributional + spectral skill normalized by the no-model
    interpolated-observation baseline (ratio < 1 beats it — the H1
    criterion) plus a calibration penalty (0 when spread/skill = 1).

Run on TPU (one process; the first trial pays the jit compile, the rest
reuse it):  python scripts/likelihood_sweep.py --out runs/sweep_meso64 \
    --config runs/sweep_meso64/base.yml --trials 24
"""

import argparse
import json
import pathlib
import pickle
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from climate2weather_tpu.exp import downscaling, metrics as metrics_mod
from climate2weather_tpu.utils.seeding import set_random_seed


def score_trial(exp_dir: pathlib.Path) -> dict:
    """Full metrics suite -> scalar summaries per variable + composite."""
    m = metrics_mod.run(str(exp_dir))
    out = {"per_var": {}}
    w2_ratios, melr_ratios, ss_pens = [], [], []
    for v in sorted(m["wasserstein"]):
        row = {}
        for name in ("wasserstein", "melr", "ssim", "crps"):
            row[name] = float(np.mean(m[name][v]["global"]))
            if "interp_baseline" in m[name][v]:
                row[name + "_interp"] = float(np.mean(m[name][v]["interp_baseline"]))
        row["spread_skill"] = float(np.mean(m["spread_skill"][v]["global"]))
        row["rank_reliability"] = float(np.mean(m["rank_reliability"][v]["global"]))
        out["per_var"][v] = row
        w2_ratios.append(row["wasserstein"] / row["wasserstein_interp"])
        melr_ratios.append(row["melr"] / row["melr_interp"])
        ss_pens.append(abs(np.log(row["spread_skill"])))
    out["w2_ratio"] = float(np.mean(w2_ratios))
    out["melr_ratio"] = float(np.mean(melr_ratios))
    out["calib_penalty"] = float(np.mean(ss_pens))
    # log scale so a 2x improvement counts the same for W2 and MELR (raw
    # W2/interp ratios are O(10-100) and would otherwise drown the rest)
    out["score"] = float(np.log(out["w2_ratio"]) + np.log(out["melr_ratio"])
                         + out["calib_penalty"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--num-samples", type=int, default=8)
    ap.add_argument("--base-seed", type=int, default=99)
    ap.add_argument("--start-trial", type=int, default=0,
                    help="resume a partial sweep (skips completed trials)")
    ap.add_argument("--point", action="append", default=None,
                    help="structured extra trial 's1,s2,s3,s4,g[,g2,g3,g4]' "
                         "(numbered from --point-base; repeatable; skips "
                         "the random draws)")
    ap.add_argument("--point-base", type=int, default=100)
    args = ap.parse_args()

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    log_path = out / "sweep.jsonl"

    # trial 0: the reference's COSMO-tuned point (round-3 eval config values,
    # from /root/reference exp/configs/000_on-model-eval/s16_t6.yml:16-22)
    cosmo_sigma = (0.1692666615037876, 0.0425178630338289,
                   0.3268027589410125, 0.3268027589410125)
    cosmo_gamma = 0.0007196856730011522

    rows = []
    if log_path.exists():
        rows = [json.loads(l) for l in log_path.read_text().splitlines()]
    done = {r["trial"] for r in rows}

    if args.point:
        schedule = []
        for i, p in enumerate(args.point):
            vals = [float(x) for x in p.split(",")]
            # 5 values: per-channel sigma + scalar gamma; 8: + per-channel
            # gamma (guidance broadcasts gamma over channels already)
            assert len(vals) in (5, 8), p
            gamma = vals[4] if len(vals) == 5 else list(vals[4:])
            schedule.append((args.point_base + i, tuple(vals[:4]), gamma))
    else:
        schedule = [(n, None, None)
                    for n in range(args.start_trial, args.trials + 1)]

    for n, sigma, gamma in schedule:
        if n in done:
            continue
        if sigma is None and n == 0:
            sigma, gamma = cosmo_sigma, cosmo_gamma
        elif sigma is None:
            set_random_seed(args.base_seed, n)
            sigma, gamma = downscaling._draw_likelihood_hparams()
        print(f"=== trial {n}: sigma={sigma} gamma={gamma}", flush=True)
        trial_dir = out / "trials" / f"t{n:02d}"
        try:
            exp_dir = downscaling.run(
                save_path=str(trial_dir),
                config_path=args.config,
                likelihood_std=list(sigma),
                likelihood_gamma=gamma,
                num_samples=args.num_samples,
            )
            row = {"trial": n, "sigma": list(sigma), "gamma": gamma,
                   **score_trial(pathlib.Path(exp_dir))}
        except Exception as e:  # isolate failures like the reference sweep
            row = {"trial": n, "sigma": list(sigma), "gamma": gamma,
                   "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        with open(log_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if "score" in row:
            print(f"  -> score {row['score']:.3f} (W2r {row['w2_ratio']:.3f} "
                  f"MELRr {row['melr_ratio']:.3f} calib {row['calib_penalty']:.3f})",
                  flush=True)

    ok = [r for r in rows if "score" in r]
    ok.sort(key=lambda r: r["score"])
    def _fmt_gamma(g):
        return ("/".join(f"{x:.3g}" for x in g) if isinstance(g, list)
                else f"{g:.3g}")

    print("\n| rank | trial | sigma | gamma | score | W2r | MELRr | calib |")
    print("|---|---|---|---|---|---|---|---|")
    for i, r in enumerate(ok):
        sig = "/".join(f"{s:.3g}" for s in r["sigma"])
        print(f"| {i+1} | {r['trial']} | {sig} | {_fmt_gamma(r['gamma'])} | "
              f"{r['score']:.3f} | {r['w2_ratio']:.3f} | {r['melr_ratio']:.3f} | "
              f"{r['calib_penalty']:.3f} |")
    with open(out / "RANKING.md", "w") as f:
        f.write("# Likelihood (sigma, gamma) sweep ranking\n\n")
        f.write("Trial 0 = reference COSMO-tuned point. Score = "
                "mean W2/interp + mean MELR/interp + mean |log spread_skill| "
                "(lower better; ratios < 1 beat the no-model baseline).\n\n")
        f.write("| rank | trial | sigma | gamma | score | W2r | MELRr | calib |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for i, r in enumerate(ok):
            sig = "/".join(f"{s:.3g}" for s in r["sigma"])
            f.write(f"| {i+1} | {r['trial']} | {sig} | {_fmt_gamma(r['gamma'])} | "
                    f"{r['score']:.3f} | {r['w2_ratio']:.3f} | "
                    f"{r['melr_ratio']:.3f} | {r['calib_penalty']:.3f} |\n")
    with open(out / "sweep_rows.pickle", "wb") as f:
        pickle.dump(rows, f)


if __name__ == "__main__":
    main()
