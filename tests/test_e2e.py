"""End-to-end integration: data build -> train -> snapshot -> guided
downscaling -> metrics, all tiny on CPU (SURVEY.md §4 integration strategy)."""

import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # integration tier: run with the full suite


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Synthetic merged grid + quantiles + normalized training h5."""
    from climate2weather_tpu.data.grid import GridDataset
    from climate2weather_tpu.data.processing import (
        compute_quantiles,
        merged_to_normed_h5,
    )

    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.RandomState(0)
    t = 48
    time = np.datetime64("2014-01-01T00", "ns") + np.arange(t) * np.timedelta64(1, "h")
    # smooth-ish fields so training/sampling are not pure noise
    base = rng.randn(t, 16, 16).astype(np.float32)
    ds = GridDataset(
        {
            v: (np.cumsum(rng.randn(t, 16, 16), axis=0) * 0.1 + i).astype(np.float32)
            for i, v in enumerate(("psl", "tas", "uas", "vas"))
        },
        {"time": time, "rlat": np.linspace(-2, 2, 16), "rlon": np.linspace(0, 4, 16)},
    )
    ds.to_file(str(root / "merged.nc"))
    compute_quantiles(ds).to_file(str(root / "quantiles.nc"))
    merged_to_normed_h5(
        str(root / "merged.nc"), str(root / "quantiles.nc"), str(root / "train.h5")
    )
    return root


@pytest.fixture(scope="module")
def trained_run(workspace):
    """Tiny trained run dir with a network snapshot (shared by the predict /
    exact-grad / fidelity tests)."""
    from climate2weather_tpu.training.loop import training_loop
    from climate2weather_tpu.utils.easydict import EasyDict
    from climate2weather_tpu.utils.logging import RunLogger

    run_dir = str(workspace / "run")
    os.makedirs(run_dir, exist_ok=True)

    window = 3
    dataset_kwargs = EasyDict(
        train=EasyDict(
            class_name="cosmo_dataset",
            data_path=str(workspace / "train.h5"),
            num_features=4,
            spatial_res=16,
            cached=True,
            window=window,
            flatten=True,
        )
    )
    network_kwargs = dict(
        channels=4 * window,
        embedding_dim=32,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        attention_levels=(),
    )
    import jax.numpy as jnp

    training_loop(
        run_dir,
        dataset_kwargs=dataset_kwargs,
        network_kwargs=network_kwargs,
        pipeline_kwargs=dict(class_name="vp_cosine"),
        optimizer_kwargs=dict(lr=1e-3, weight_decay=1e-3),
        lr_kwargs=dict(func_name="lr/linear", ref_lr=1e-3, total_ndata=1024),
        batch_size=64,
        batch_gpu=None,
        total_ndata=1024,
        log_ndata=None,
        status_ndata=None,
        snapshot_ndata=1024,
        checkpoint_ndata=None,
        valid_ndata=None,
        seed=0,
        logger=RunLogger(run_dir, enabled=False),
        compute_dtype=jnp.float32,
        loader_threads=1,
    )
    return run_dir


def test_train_snapshot_predict_metrics(workspace, trained_run):
    from climate2weather_tpu.exp import downscaling, metrics

    run_dir = trained_run
    snaps = [d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")]
    assert snaps, os.listdir(run_dir)

    cfg = dict(
        model_path=os.path.join(run_dir, snaps[0]),
        data_path=str(workspace / "merged.nc"),
        quantile_path=str(workspace / "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=12,
        data_norm_mode="quant95",
        observation_path=str(workspace / "merged.nc"),
        data_vars=["psl", "tas", "uas", "vas"],
        num_sampling_steps=4,
        num_samples=2,
        num_corrections=0,
        likelihood_std=[0.17, 0.04, 0.33, 0.33],
        likelihood_gamma=7e-4,
        t_step=3,
        s_step=4,
        batch_size=4,
        seed=0,
        use_exact_grad=False,
    )
    cfg_path = str(workspace / "exp.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    exp_dir = downscaling.run(str(workspace / "exp_out"), cfg_path)
    files = sorted(os.listdir(exp_dir))
    assert "ground_truth.nc" in files
    assert "observation.nc" in files
    assert "gen_sample_000.nc" in files and "gen_sample_001.nc" in files

    m = metrics.run(str(exp_dir))
    for kind in ("wasserstein", "melr", "ssim"):
        for v in ("psl", "tas", "uas", "vas"):
            vals = m[kind][v]["global"]
            assert np.all(np.isfinite(vals)), (kind, v, vals)

    # year-scale scoring protocol: every Nth observed frame, recorded
    m2 = metrics.run(str(exp_dir), time_stride=2)
    assert m2["protocol"]["time_stride"] == 2
    assert m2["protocol"]["num_times"] == (len(m["melr"]) and
                                           -(-m["protocol"]["num_times"] // 2))
    for v in ("psl", "tas", "uas", "vas"):
        assert np.all(np.isfinite(m2["melr"][v]["global"]))
        assert "interp_baseline" in m2["melr"][v]  # obs rows strided too


def test_exact_grad_predict(workspace, trained_run):
    """The autodiff guidance path must run end-to-end too."""
    run_dir = trained_run
    snaps = [d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")]
    from climate2weather_tpu.exp import downscaling

    cfg = dict(
        model_path=os.path.join(run_dir, snaps[0]),
        data_path=str(workspace / "merged.nc"),
        quantile_path=str(workspace / "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=8,
        data_norm_mode="quant95",
        observation_path=str(workspace / "merged.nc"),
        data_vars=["psl", "tas", "uas", "vas"],
        num_sampling_steps=2,
        num_samples=1,
        num_corrections=1,
        likelihood_std=0.1,
        likelihood_gamma=1e-3,
        t_step=2,
        s_step=4,
        batch_size=4,
        seed=1,
        use_exact_grad=True,
    )
    import yaml

    cfg_path = str(workspace / "exp_exact.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = downscaling.run(str(workspace / "exp_exact_out"), cfg_path)
    assert (exp_dir / "gen_sample_000.nc").exists()


def test_fidelity_harness(workspace, trained_run):
    """The acceptance harness must run guided + unconditional + metrics and
    emit FIDELITY.md with finite numbers for every variable."""
    run_dir = trained_run
    snaps = [d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")]
    from climate2weather_tpu.exp.fidelity import run as fidelity_run

    r = fidelity_run(
        snapshot=os.path.join(run_dir, snaps[0]),
        data_nc=str(workspace / "merged.nc"),
        quantiles=str(workspace / "quantiles.nc"),
        out=str(workspace / "fid"),
        start_time="2014-01-01-00",
        num_hours=12, num_samples=2, num_sampling_steps=2,
        ensemble_batch=1, batch_size=4, t_step=3, s_step=4,
        uncond_samples=2, seed=3, skip_figures=True,
    )
    report = workspace / "fid" / "FIDELITY.md"
    assert report.exists()
    for side in ("guided", "uncond"):
        for kind in ("wasserstein", "melr", "ssim"):
            for v in ("psl", "tas", "uas", "vas"):
                vals = r[side][kind][v]["global"]
                assert np.all(np.isfinite(vals)), (side, kind, v)


def test_guidance_prolong_predict(workspace, trained_run):
    """The scale-selective (prolong) guidance must run end-to-end through the
    config surface (H2 formulation, docs/fidelity/meso128/H2_PREREG.md)."""
    import yaml

    from climate2weather_tpu.exp import downscaling

    run_dir = trained_run
    snaps = [d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")]
    cfg = dict(
        model_path=os.path.join(run_dir, snaps[0]),
        data_path=str(workspace / "merged.nc"),
        quantile_path=str(workspace / "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=8,
        data_norm_mode="quant95",
        observation_path=str(workspace / "merged.nc"),
        data_vars=["psl", "tas", "uas", "vas"],
        num_sampling_steps=2,
        num_samples=1,
        num_corrections=0,
        likelihood_std=[0.17, 0.04, 0.33, 0.33],
        likelihood_gamma=7e-4,
        guidance_prolong=True,
        t_step=2,
        s_step=4,
        batch_size=4,
        seed=2,
        use_exact_grad=False,
    )
    cfg_path = str(workspace / "exp_prolong.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = downscaling.run(str(workspace / "exp_prolong_out"), cfg_path)
    assert (exp_dir / "gen_sample_000.nc").exists()
    frozen = yaml.safe_load((exp_dir / "config_freeze.yaml").read_text())
    assert frozen["guidance_prolong"] is True


def test_t0_project_predict(workspace, trained_run):
    """Projection-only conditioning end-to-end (H6 point A, docs/fidelity/
    meso128/H6_PREREG.md): guidance OFF during sampling, t=0 band-limited
    data-consistency projection after — the saved sample's block means at
    observed times must equal the observation exactly (both are
    denormalized through the same per-channel affine, which commutes with
    block-averaging)."""
    import yaml

    import numpy as np

    from climate2weather_tpu.data.grid import open_grid
    from climate2weather_tpu.exp import downscaling

    run_dir = trained_run
    snaps = [d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")]
    s_step, t_step = 4, 2
    cfg = dict(
        model_path=os.path.join(run_dir, snaps[0]),
        data_path=str(workspace / "merged.nc"),
        quantile_path=str(workspace / "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=8,
        data_norm_mode="quant95",
        observation_path=str(workspace / "merged.nc"),
        data_vars=["psl", "tas", "uas", "vas"],
        num_sampling_steps=2,
        num_samples=1,
        num_corrections=0,
        likelihood_std=[0.17, 0.04, 0.33, 0.33],
        likelihood_gamma=7e-4,
        guidance_off=True,
        t0_project="spectral",
        t0_project_iters=2,
        t_step=t_step,
        s_step=s_step,
        batch_size=4,
        seed=3,
        use_exact_grad=False,
    )
    cfg_path = str(workspace / "exp_t0proj.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = downscaling.run(str(workspace / "exp_t0proj_out"), cfg_path)
    assert (exp_dir / "gen_sample_000.nc").exists()
    frozen = yaml.safe_load((exp_dir / "config_freeze.yaml").read_text())
    assert frozen["t0_project"] == "spectral" and frozen["guidance_off"] is True

    gen = open_grid(str(exp_dir / "gen_sample_000.nc"))
    obs = open_grid(str(exp_dir / "observation.nc"))
    for v in ("psl", "uas"):
        g = np.asarray(gen.data_vars[v])[::t_step]
        lo, H, W = g.shape
        blocks = g.reshape(lo, H // s_step, s_step, W // s_step, s_step)
        means = blocks.mean(axis=(2, 4))
        o = np.asarray(obs.data_vars[v])[: means.shape[0]]
        span = max(float(np.abs(o).max()), 1.0)
        assert np.abs(means - o).max() < 1e-3 * span, v


def test_spectral_calibrate_predict(workspace, trained_run):
    """H7 point-B path end-to-end: guided sampling + climatological spectral
    calibration + t=0 projection. The saved (denormalized) sample's
    out-of-obs-band annulus PSD must be an affine-scale multiple of the
    training-climatology target (denormalization is per-channel affine:
    PSD scales by a single factor per channel), and projection consistency
    must survive the composition."""
    import yaml

    import numpy as np

    from climate2weather_tpu.data.grid import open_grid
    from climate2weather_tpu.diffusion.calibrate import (
        annulus_index_map,
        climatological_annulus_psd,
        obs_square_mask,
    )
    from climate2weather_tpu.exp import downscaling

    run_dir = trained_run
    snaps = [d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")]
    s_step, t_step = 4, 2
    cfg = dict(
        model_path=os.path.join(run_dir, snaps[0]),
        data_path=str(workspace / "merged.nc"),
        quantile_path=str(workspace / "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=8,
        data_norm_mode="quant95",
        observation_path=str(workspace / "merged.nc"),
        data_vars=["psl", "tas", "uas", "vas"],
        num_sampling_steps=2,
        num_samples=1,
        num_corrections=0,
        likelihood_std=[0.17, 0.04, 0.33, 0.33],
        likelihood_gamma=7e-4,
        spectral_calibrate=str(workspace / "train.h5"),
        t0_project="spectral",
        t0_project_iters=2,
        t_step=t_step,
        s_step=s_step,
        batch_size=4,
        seed=5,
        use_exact_grad=False,
    )
    cfg_path = str(workspace / "exp_calib.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = downscaling.run(str(workspace / "exp_calib_out"), cfg_path)
    assert (exp_dir / "gen_sample_000.nc").exists()
    frozen = yaml.safe_load((exp_dir / "config_freeze.yaml").read_text())
    assert frozen["spectral_calibrate"].endswith("train.h5")

    target = climatological_annulus_psd(str(workspace / "train.h5"),
                                        s_step=s_step)
    gen = open_grid(str(exp_dir / "gen_sample_000.nc"))
    obs = open_grid(str(exp_dir / "observation.nc"))
    idx, n_bins = annulus_index_map(16, 16)
    outside = ~obs_square_mask(16, 16, s_step)
    sel = idx[outside]
    counts = np.bincount(sel, minlength=n_bins).astype(float)
    for c, v in enumerate(sorted(["psl", "tas", "uas", "vas"])):
        g = np.asarray(gen.data_vars[v])
        F = np.fft.fftshift(np.fft.fft2(g), axes=(1, 2))
        p2 = (np.abs(F) ** 2 / (16 * 16))[:, outside].mean(axis=0)
        sums = np.zeros(n_bins)
        np.add.at(sums, sel, p2)
        got = np.divide(sums, counts, out=np.zeros(n_bins), where=counts > 0)
        good = target[c] > 1e-10
        ratio = got[good] / target[c][good]
        # one affine scale per channel up to the max_gain clamp: the tiny
        # 2-step model's annulus powers are near-zero so the clamp engages
        # per-frame and scatters the profile; exact target matching is
        # pinned by tests/test_spectral_calibrate.py on realistic power —
        # here assert the profile is within a factor 2 (plumbing, not
        # precision)
        assert ratio.max() / max(ratio.min(), 1e-12) < 2.0, (v, ratio)
        # projection consistency on the same saved sample (tolerance is
        # relative to the FIELD scale: fp32 ffts are exact to ~1e-7 of the
        # field amplitude, and the tiny model's calibrated amplitude is
        # arbitrary)
        o = np.asarray(obs.data_vars[v])
        gt_means = g[::t_step].reshape(-1, 4, s_step, 4, s_step).mean(
            axis=(2, 4))[: o.shape[0]]
        span = max(float(np.abs(g).max()), float(np.abs(o).max()), 1.0)
        assert np.abs(gt_means - o).max() < 1e-4 * span, v


def test_long_path_calibrate_project_predict(workspace, trained_run):
    """The winning pipeline (guidance + SDE dpmpp2m + climatological
    calibration + t=0 projection) through the NCHW memory-bounded LONG
    sampler (long_trajectory_threshold forced below num_hours) — the
    year-scale configuration (H9/YEAR2014). Calibration and projection run
    as chunked device post-processing (diffusion/calibrate.
    postprocess_long_nchw); the saved sample's block means at observed
    times must equal the observation."""
    import yaml

    import numpy as np

    from climate2weather_tpu.data.grid import open_grid
    from climate2weather_tpu.exp import downscaling

    run_dir = trained_run
    snaps = [d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")]
    s_step, t_step = 4, 2
    cfg = dict(
        model_path=os.path.join(run_dir, snaps[0]),
        data_path=str(workspace / "merged.nc"),
        quantile_path=str(workspace / "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=8,
        long_trajectory_threshold=6,  # force the long path at L=8
        data_norm_mode="quant95",
        observation_path=str(workspace / "merged.nc"),
        data_vars=["psl", "tas", "uas", "vas"],
        sampler_kind="dpmpp2m",
        sde_eta=0.3,
        denoise_final=True,
        num_sampling_steps=4,
        num_samples=1,
        num_corrections=0,
        likelihood_std=[0.17, 0.04, 0.33, 0.33],
        likelihood_gamma=7e-4,
        spectral_calibrate=str(workspace / "train.h5"),
        t0_project="spectral",
        t0_project_iters=2,
        t_step=t_step,
        s_step=s_step,
        batch_size=4,
        seed=7,
        use_exact_grad=False,
    )
    cfg_path = str(workspace / "exp_long_calib.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = downscaling.run(str(workspace / "exp_long_calib_out"), cfg_path)
    assert (exp_dir / "gen_sample_000.nc").exists()
    frozen = yaml.safe_load((exp_dir / "config_freeze.yaml").read_text())
    assert frozen["spectral_calibrate"].endswith("train.h5")
    assert frozen["long_trajectory_threshold"] == 6

    gen = open_grid(str(exp_dir / "gen_sample_000.nc"))
    obs = open_grid(str(exp_dir / "observation.nc"))
    for v in ("psl", "uas"):
        g = np.asarray(gen.data_vars[v])
        assert np.isfinite(g).all(), v
        o = np.asarray(obs.data_vars[v])
        gt_means = g[::t_step].reshape(-1, 4, s_step, 4, s_step).mean(
            axis=(2, 4))[: o.shape[0]]
        # bf16 is only used beyond 4000 frames; at L=8 the trajectory is
        # fp32, same tolerance as the short-path test
        span = max(float(np.abs(g).max()), float(np.abs(o).max()), 1.0)
        assert np.abs(gt_means - o).max() < 1e-4 * span, v


def test_likelihood_sweep_uncond_constraint(workspace, trained_run, monkeypatch):
    """The constrained sweep driver end-to-end: structured points, the shared
    unconditional control, feasibility in the ranking (H2 sweep protocol)."""
    import importlib.util
    import json
    import pathlib
    import sys

    spec = importlib.util.spec_from_file_location(
        "likelihood_sweep",
        pathlib.Path(__file__).resolve().parents[1] / "scripts"
        / "likelihood_sweep.py",
    )
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)

    run_dir = trained_run
    snaps = [d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")]
    cfg = dict(
        model_path=os.path.join(run_dir, snaps[0]),
        data_path=str(workspace / "merged.nc"),
        quantile_path=str(workspace / "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=12,
        data_norm_mode="quant95",
        observation_path=str(workspace / "merged.nc"),
        data_vars=["psl", "tas", "uas", "vas"],
        num_sampling_steps=2,
        num_samples=2,
        num_corrections=0,
        likelihood_std=[0.17, 0.04, 0.33, 0.33],
        likelihood_gamma=7e-4,
        t_step=3,
        s_step=4,
        batch_size=4,
        seed=0,
        use_exact_grad=False,
    )
    cfg_path = str(workspace / "sweep_base.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out = workspace / "sweep_out"
    argv = ["likelihood_sweep.py", "--out", str(out), "--config", cfg_path,
            "--num-samples", "2", "--uncond", "--uncond-samples", "2",
            "--gate-vars", "uas,vas",
            "--point", "0.17,0.04,0.33,0.33,0.0007",
            "--point-base", "200", "--guidance-prolong"]
    monkeypatch.setattr(sys, "argv", argv)
    sweep.main()

    rows = [json.loads(l)
            for l in (out / "sweep.jsonl").read_text().splitlines()]
    assert len(rows) == 1 and rows[0]["trial"] == 200
    assert rows[0]["prolong"] is True and "score" in rows[0]
    assert (out / "uncond_metrics.json").exists()
    ranking = (out / "RANKING.md").read_text()
    assert "Conditioning constraint" in ranking
    assert "prolong" in ranking
    # feasibility column rendered (yes/NO, never n/a once --uncond ran)
    assert "| n/a |" not in ranking
