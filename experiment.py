"""Top-level experiment CLI (reference experiment.py: predict / figures; plus
metrics, which the reference exposes as ``python -m exp.metrics``)."""

from __future__ import annotations

import click

from climate2weather_tpu.parallel.mesh import configure_platform


@click.group()
def cli():
    configure_platform()


@cli.command()
@click.option("--save-path", required=True, type=str)
@click.option("--config-path", required=True, type=str)
@click.option("--num-samples", type=int, default=None)
@click.option("--num-hours", type=int, default=None)
@click.option("--num-sampling-steps", type=int, default=None)
@click.option("--num-corrections", type=int, default=None)
@click.option("--corrector-variance-exact", type=bool, default=None,
              help="variance-exact Langevin corrector noise (see "
                   "diffusion/steprules.langevin_noise_scale)")
@click.option("--sde-eta", type=float, default=None,
              help="SDE-DPM-Solver++(2M) noise strength (sampler_kind "
                   "dpmpp2m; 0 = deterministic)")
@click.option("--batch-size", type=int, default=None)
@click.option("--seed", type=int, default=None)
@click.option("--observation-path", type=str, default=None)
def predict(save_path, config_path, **overrides):
    """Guided downscaling (reference exp/downscaling.py run)."""
    from climate2weather_tpu.exp import downscaling

    downscaling.run(save_path=save_path, config_path=config_path, **overrides)


@cli.command("hparam-sweep")
@click.option("--save-path", required=True, type=str)
@click.option("--config-path", required=True, type=str)
@click.option("--trials", type=int, default=10)
@click.option("--base-seed", type=int, default=99)
def hparam_sweep(save_path, config_path, trials, base_seed):
    """Random search over likelihood (sigma, gamma)."""
    from climate2weather_tpu.exp import downscaling

    downscaling.sweep_likelihood_hparams(save_path, config_path, trials, base_seed)


@cli.group()
def metrics():
    pass


@metrics.command("run")
@click.argument("exp_dir")
@click.option("--time-stride", default=1, type=int, show_default=True,
              help="score every Nth observed frame (year-scale protocol; "
                   "recorded in the metrics pickle)")
def metrics_run(exp_dir, time_stride):
    from climate2weather_tpu.exp import metrics as m

    m.run(exp_dir, time_stride=time_stride)


@metrics.command("load")
@click.argument("exp_dir")
def metrics_load(exp_dir):
    from climate2weather_tpu.exp import metrics as m

    m.load(exp_dir)


@cli.command()
@click.argument("kind")
@click.argument("exp_dir")
@click.option("--out-dir", type=str, default=None)
@click.option("--compare", type=str, multiple=True,
              help="Additional experiment dirs (downscaled_clim_dist)")
def figures(kind, exp_dir, out_dir, compare):
    """Paper figures: kde_and_pmf | timeseries | storm_grid | climate_grid |
    big_grid | rapsd | windpower | downscaled_clim_dist."""
    from climate2weather_tpu.exp import figures as f

    f.make(kind, exp_dir, out_dir, compare=list(compare))


@cli.command()
@click.option("--snapshot", required=True)
@click.option("--data-nc", required=True)
@click.option("--quantiles", required=True)
@click.option("--out", required=True)
@click.option("--start-time", required=True)
@click.option("--num-hours", default=49, type=int, show_default=True)
@click.option("--num-samples", default=30, type=int, show_default=True)
@click.option("--num-sampling-steps", default=256, type=int, show_default=True)
@click.option("--corrections", default=0, type=int, show_default=True,
              help="Langevin corrector steps per predictor step")
@click.option("--correction-tau", default=0.5, type=float, show_default=True)
@click.option("--corrector-variance-exact", is_flag=True,
              help="variance-exact Langevin corrector noise (see "
                   "diffusion/steprules.langevin_noise_scale)")
@click.option("--ensemble-batch", default=3, type=int, show_default=True)
@click.option("--uncond-samples", default=None, type=int)
@click.option("--seed", default=0, type=int, show_default=True)
@click.option("--skip-figures", is_flag=True)
@click.option("--denoise-final", is_flag=True,
              help="extra score pass at t=0 removes the sigma(0)=eta "
                   "residual noise floor from every sample")
@click.option("--sampler-kind", type=click.Choice(["pc", "dpmpp2m", "dpmpp3m"]),
              default="pc", show_default=True,
              help="predictor family: reference PC, DPM++(2M), or DPM++(3M)")
@click.option("--sde-eta", default=0.0, type=float, show_default=True,
              help="SDE-DPM-Solver++(2M) noise strength (dpmpp2m only)")
@click.option("--likelihood-std", multiple=True, type=float,
              help="per-channel guidance sigma (repeat 4x; default = "
                   "reference COSMO-tuned values)")
@click.option("--likelihood-gamma", multiple=True, type=float,
              help="guidance gamma: one value = scalar, repeat 4x for "
                   "per-channel (default = reference COSMO value)")
def fidelity(**kw):
    """Statistical acceptance: guided + unconditional ensembles, W2/MELR/SSIM
    for both, figures, and a FIDELITY.md table (exp/fidelity.py)."""
    from climate2weather_tpu.exp.fidelity import DEFAULT_GAMMA
    from climate2weather_tpu.exp.fidelity import run as fidelity_run

    std = kw.pop("likelihood_std") or None
    gamma = kw.pop("likelihood_gamma")
    if len(gamma) == 0:
        gamma = DEFAULT_GAMMA
    elif len(gamma) == 1:
        gamma = float(gamma[0])
    else:
        gamma = list(gamma)
    fidelity_run(likelihood_std=list(std) if std else None,
                 likelihood_gamma=gamma, **kw)


@cli.command()
@click.argument("exp_dir")
@click.option("--var", default="tas", show_default=True)
@click.option("--out-path", type=str, default=None)
@click.option("--fps", type=int, default=6, show_default=True)
@click.option("--max-frames", type=int, default=72, show_default=True)
def animation(exp_dir, var, out_path, fps, max_frames):
    """GIF animation: ground truth vs samples over time
    (reference plotting_util.create_animation)."""
    import os

    from climate2weather_tpu.exp import exputil
    from climate2weather_tpu.exp.plotting_util import create_animation

    samples, gt, obs = exputil.setup(exp_dir)
    out_path = out_path or os.path.join(exp_dir, "figures", f"animation_{var}.gif")
    if os.path.dirname(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
    labels = ["ground truth"] + [f"sample {i}" for i in range(min(2, len(samples)))]
    create_animation(
        [gt] + samples[:2], var, labels, out_path, fps=fps, max_frames=max_frames
    )
    print(f"Saved {out_path}")


if __name__ == "__main__":
    cli()
