"""Statistical-fidelity acceptance harness.

The reference's de-facto acceptance test is its paper-metrics machinery run
on a trained checkpoint (exp/metrics.py:219-296 protocol on the
exp/configs/000_on-model-eval workload).  This module packages that whole
protocol as one command:

1. guided downscaling of a held-out window (self-observation conditioning,
   the on-model-eval setup, reference exp/configs/000_on-model-eval/s16_t6.yml),
2. an unconditional ensemble of the same shape (the "guidance off" control —
   quality claims require guided << unconditional on Wasserstein/SSIM),
3. metrics (sliced W2 / MELR / SSIM, observation-time-grid protocol) for both,
4. spectra + distribution + map figures for the guided run,
5. a FIDELITY.md summary table.

Usage:
    python -m climate2weather_tpu.exp.fidelity \
        --snapshot runs/.../network-snapshot-XXXXXXX-0.999900 \
        --data-nc runs/synth/eval_merged.nc \
        --quantiles runs/synth/quantiles.h5 \
        --out runs/fidelity_eval --start-time 2014-01-07-00
"""

from __future__ import annotations

import os
import pathlib
from typing import Optional, Sequence

import numpy as np
import yaml

# reference-tuned likelihood hyperparameters (s16_t6.yml:16-22)
DEFAULT_STD = [0.1692666615037876, 0.0425178630338289,
               0.3268027589410125, 0.3268027589410125]
DEFAULT_GAMMA = 0.0007196856730011522


def _predict(out_dir: str, cfg: dict) -> pathlib.Path:
    from climate2weather_tpu.exp import downscaling

    os.makedirs(out_dir, exist_ok=True)
    cfg_path = os.path.join(out_dir, "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return downscaling.run(out_dir, cfg_path)


def _fmt(vals) -> str:
    return f"{np.mean(vals):.4f} ± {np.std(vals):.4f}"


def run(
    snapshot: str,
    data_nc: str,
    quantiles: str,
    out: str,
    start_time: str,
    num_hours: int = 49,
    num_samples: int = 30,
    num_sampling_steps: int = 256,
    corrections: int = 0,
    correction_tau: float = 0.5,
    corrector_variance_exact: bool = False,
    ensemble_batch: int = 3,
    batch_size: int = 128,
    t_step: int = 6,
    s_step: int = 16,
    data_vars: Sequence[str] = ("psl", "tas", "uas", "vas"),
    likelihood_std: Optional[Sequence[float]] = None,
    likelihood_gamma=DEFAULT_GAMMA,  # scalar or per-channel sequence
    guidance_prolong: bool = False,
    guidance_anneal: float = 0.0,
    t0_project: str = "",
    t0_project_iters: int = 3,
    guidance_off: bool = False,
    spectral_calibrate: str = "",
    uncond_samples: Optional[int] = None,
    seed: int = 0,
    skip_figures: bool = False,
    denoise_final: bool = False,
    sampler_kind: str = "pc",
    sde_eta: float = 0.0,
) -> dict:
    from climate2weather_tpu.exp import figures, metrics

    out_path = pathlib.Path(out)
    out_path.mkdir(parents=True, exist_ok=True)
    base = dict(
        model_path=snapshot,
        data_path=data_nc,
        quantile_path=quantiles,
        start_time=start_time,
        num_hours=int(num_hours),
        data_norm_mode="quant95",
        data_vars=list(data_vars),
        num_sampling_steps=int(num_sampling_steps),
        num_corrections=int(corrections),
        correction_tau=float(correction_tau),
        corrector_variance_exact=bool(corrector_variance_exact),
        t_step=int(t_step),
        s_step=int(s_step),
        batch_size=int(batch_size),
        ensemble_batch=int(ensemble_batch),
        seed=int(seed),
        use_exact_grad=False,
        denoise_final=bool(denoise_final),
        sampler_kind=str(sampler_kind),
        sde_eta=float(sde_eta),
    )

    print("=== guided (on-model-eval conditioning) ===")
    guided_dir = _predict(
        str(out_path / "guided"),
        dict(
            base,
            observation_path=data_nc,
            likelihood_std=list(likelihood_std or DEFAULT_STD),
            likelihood_gamma=(
                list(likelihood_gamma)
                if isinstance(likelihood_gamma, (list, tuple))
                else float(likelihood_gamma)
            ),
            guidance_prolong=bool(guidance_prolong),
            guidance_anneal=float(guidance_anneal),
            t0_project=str(t0_project),
            t0_project_iters=int(t0_project_iters),
            guidance_off=bool(guidance_off),
            spectral_calibrate=str(spectral_calibrate),
            num_samples=int(num_samples),
        ),
    )

    print("=== unconditional control ===")
    uncond_dir = _predict(
        str(out_path / "uncond"),
        dict(
            base,
            observation_path=None,
            num_samples=int(uncond_samples or max(8, num_samples // 2)),
        ),
    )
    # metrics need an observation grid to define comparison times; the
    # unconditional run saves no observation.nc, so borrow the guided one
    # (same window, same grid).
    import shutil

    if not (pathlib.Path(uncond_dir) / "observation.nc").exists():
        shutil.copy(
            pathlib.Path(guided_dir) / "observation.nc",
            pathlib.Path(uncond_dir) / "observation.nc",
        )
        shutil.copy(
            pathlib.Path(guided_dir) / "ground_truth.nc",
            pathlib.Path(uncond_dir) / "ground_truth.nc",
        )

    print("=== metrics: guided ===")
    m_guided = metrics.run(str(guided_dir))
    print("=== metrics: unconditional ===")
    m_uncond = metrics.run(str(uncond_dir))

    if not skip_figures:
        fig_kinds = ("kde_and_pmf", "rapsd", "timeseries", "storm_grid",
                     "windpower_dist", "climate_grid", "calibration")
        for kind in fig_kinds:
            try:
                figures.make(kind, str(guided_dir))
            except Exception as e:  # figures must not block the numbers
                print(f"figure {kind} failed: {type(e).__name__}: {e}")

    # ---- FIDELITY.md ------------------------------------------------------
    lines = [
        "# Statistical fidelity report",
        "",
        f"- snapshot: `{snapshot}`",
        f"- workload: {num_hours} h from {start_time}, {num_samples} guided "
        f"samples, {num_sampling_steps} steps, s_step={s_step}, "
        f"t_step={t_step} (reference on-model-eval protocol, "
        "exp/configs/000_on-model-eval/s16_t6.yml"
        + (f", sampler={sampler_kind}" if sampler_kind != "pc" else "")
        + (f", sde_eta={sde_eta}" if sde_eta else "")
        + (", final-denoise" if denoise_final else "")
        + (f", {corrections} Langevin correction(s) tau={correction_tau}"
           + (", variance-exact noise" if corrector_variance_exact else "")
           if corrections else "") + ")",
        f"- metrics protocol: observation time grid, gt-standardized "
        f"sliced W2 (100 proj.), MELR over RAPSD, SSIM "
        "(reference exp/metrics.py:219-296)",
        f"- likelihood hparams: sigma={list(likelihood_std or DEFAULT_STD)}, "
        f"gamma={likelihood_gamma}"
        + (", prolong (scale-selective) guidance" if guidance_prolong else "")
        + (f", anneal t_rel={guidance_anneal} (gamma(t) release)"
           if guidance_anneal else "")
        + (", guidance OFF (projection-only)" if guidance_off else "")
        + (f", t0-projection method={t0_project} iters={t0_project_iters}"
           if t0_project else "")
        + (f", climatological spectral calibration ({spectral_calibrate})"
           if spectral_calibrate else ""),
        "",
        "| metric | variable | guided | unconditional | interp. obs baseline |",
        "|---|---|---|---|---|",
    ]
    for kind in ("wasserstein", "melr", "ssim", "crps", "spread_skill",
                 "rank_reliability"):
        for v in sorted(m_guided.get(kind, {})):
            bl = m_guided[kind][v].get("interp_baseline")
            uc = m_uncond.get(kind, {}).get(v, {}).get("global")
            lines.append(
                f"| {kind} | {v} | {_fmt(m_guided[kind][v]['global'])} "
                f"| {_fmt(uc) if uc is not None else 'n/a'} "
                f"| {_fmt(bl) if bl is not None else 'n/a'} |"
            )
    lines += [
        "",
        "Guided sampling must beat the unconditional control on W2 and SSIM "
        "(it is conditioned on coarsened truth); MELR measures spectral "
        "fidelity: guided must stay near the unconditional model's spectrum "
        "(both should be small) while beating the interpolated-observation "
        "baseline, which has no power above the observation Nyquist.",
        f"\nFigures: `{guided_dir}/figures/`",
    ]
    report = out_path / "FIDELITY.md"
    report.write_text("\n".join(lines) + "\n")
    print(f"Wrote {report}")
    return {"guided": m_guided, "uncond": m_uncond,
            "guided_dir": str(guided_dir), "uncond_dir": str(uncond_dir)}


def main():
    import click

    @click.command()
    @click.option("--snapshot", required=True)
    @click.option("--data-nc", required=True)
    @click.option("--quantiles", required=True)
    @click.option("--out", required=True)
    @click.option("--start-time", required=True)
    @click.option("--num-hours", default=49, type=int)
    @click.option("--num-samples", default=30, type=int)
    @click.option("--num-sampling-steps", default=256, type=int)
    @click.option("--corrections", default=0, type=int,
                  help="Langevin corrector steps per predictor step")
    @click.option("--correction-tau", default=0.5, type=float)
    @click.option("--corrector-variance-exact", is_flag=True,
                  help="variance-exact Langevin corrector noise "
                       "(steprules.langevin_noise_scale)")
    @click.option("--ensemble-batch", default=3, type=int)
    @click.option("--uncond-samples", default=None, type=int)
    @click.option("--seed", default=0, type=int)
    @click.option("--skip-figures", is_flag=True)
    @click.option("--denoise-final", is_flag=True,
                  help="extra score pass at t=0 removes the sigma(0)=eta "
                       "residual noise floor from every sample")
    @click.option("--sampler-kind", default="pc", show_default=True,
                  type=click.Choice(["pc", "dpmpp2m", "dpmpp3m"]),
                  help="reverse-process solver for both ensembles")
    @click.option("--sde-eta", default=0.0, type=float,
                  help="SDE-DPM-Solver++(2M) noise strength (dpmpp2m only)")
    @click.option("--likelihood-std", multiple=True, type=float,
                  help="per-channel guidance sigma (repeat 4x; default = "
                       "reference COSMO-tuned values)")
    @click.option("--likelihood-gamma", multiple=True, type=float,
                  help="guidance gamma: one value = scalar, repeat 4x for "
                       "per-channel (default = reference COSMO value)")
    @click.option("--guidance-prolong", is_flag=True,
                  help="scale-selective guidance: spread the likelihood "
                       "residual with a bilinear prolongation (band-limited "
                       "below the observation Nyquist) instead of the exact "
                       "block adjoint (H2, docs/fidelity/meso128/H2_PREREG.md)")
    @click.option("--guidance-anneal", default=0.0, type=float,
                  help="gamma(t) release time t_rel in [0,1]: likelihood "
                       "gradient weighted by min(t/t_rel, 1) so the pin "
                       "releases at low noise where the fine bands form "
                       "(H4, docs/fidelity/meso128/H4_PREREG.md); 0 = off")
    @click.option("--t0-project", default="",
                  type=click.Choice(["", "spectral", "block"]),
                  help="t=0 data-consistency projection of each finished "
                       "sample onto {x : A(x) = y} (H6, docs/fidelity/"
                       "meso128/H6_PREREG.md): 'spectral' = exact band-"
                       "limited Dirichlet-gain inverse, 'block' = exact "
                       "piecewise-constant right-inverse; empty = off")
    @click.option("--t0-project-iters", default=3, type=int,
                  help="Nyquist-bin polish passes for the spectral "
                       "projection")
    @click.option("--guidance-off", is_flag=True,
                  help="sample the conditioned ensemble WITHOUT likelihood "
                       "guidance (projection-only designs: H6 point A)")
    @click.option("--spectral-calibrate", default="",
                  help="path to the TRAINING normed h5: rescale each "
                       "sample's out-of-obs-band annulus amplitudes to the "
                       "training-set climatological spectrum (H7, docs/"
                       "fidelity/meso128/H7_PREREG.md); empty = off")
    def cli(**kw):
        std = kw.pop("likelihood_std") or None
        gamma = kw.pop("likelihood_gamma")
        if len(gamma) == 0:
            gamma = DEFAULT_GAMMA
        elif len(gamma) == 1:
            gamma = float(gamma[0])
        else:
            gamma = list(gamma)
        run(likelihood_std=list(std) if std else None,
            likelihood_gamma=gamma, **kw)

    cli()


if __name__ == "__main__":
    main()
