"""Guided downscaling driver — posterior sampling of weather trajectories
conditioned on coarse climate fields.

Capability parity with the reference ``exp/downscaling.py`` (the ``predict``
entry point, exp/downscaling.py:18-287):

- YAML config + CLI kwarg overrides, numbered save subdirectories,
  ``config_freeze.yaml``
- snapshot loading (markov order from the stored dataset window)
- observation operator A = AvgPool(s_step) after ::t_step subsampling
- three conditioning modes: none / self-observation of the ground truth /
  external observation file (e.g. CMIP6 runs), with per-channel
  likelihood std/gamma
- sample sharding across processes; ``ground_truth.nc`` / ``observation.nc``
  / ``gen_sample_{id:03d}.nc`` outputs after de-normalization
- ``sweep_likelihood_hparams`` random log-space search over (sigma, gamma)

TPU-first: the whole trajectory stays in HBM; the PC sampler is one
jit-compiled scan whose score evaluation runs chunked (and optionally
sequence-parallel over the mesh) — no host round-trips per chunk; the
production detached-guidance mode uses the analytic adjoint (see
diffusion/guidance.py).
"""

from __future__ import annotations

import os
import pathlib
from datetime import datetime
from typing import Optional, Sequence, Union

import numpy as np
import yaml

from climate2weather_tpu.data import pipeline as data_pipeline
from climate2weather_tpu.diffusion.guidance import (
    GaussianGuidance,
    SpatioTemporalCoarsening,
    per_channel,
)
from climate2weather_tpu.diffusion.window import WindowScoreFn, make_batched_eps_fn
from climate2weather_tpu.models.score_net import build_score_unet
from climate2weather_tpu.training.checkpoint import load_snapshot
from climate2weather_tpu.utils.registry import construct_class_by_name
from climate2weather_tpu.utils.seeding import derive_seed, set_random_seed


def run(
    save_path: str,
    config_path: str,
    **kwargs,
):
    """Load a YAML experiment config (reference exp/configs/** surface),
    apply overrides, create the numbered save dir, and run."""
    import jax

    config_path = pathlib.Path(config_path)
    save_path = pathlib.Path(save_path)

    if save_path.exists():
        subdir_i = len([s for s in save_path.iterdir() if s.is_dir()]) + 1
    else:
        subdir_i = 1
    save_path = save_path / f"{subdir_i:03d}_{config_path.stem}"

    if not (config_path.exists() and config_path.suffix.lower() in (".yaml", ".yml")):
        raise FileNotFoundError(f"Config file not found: {config_path}")

    with open(config_path) as f:
        config = yaml.safe_load(f)

    for k, v in kwargs.items():
        if v is None:
            continue
        # apply CLI overrides even when the YAML lacks the key — older
        # configs predate newer knobs (sde_eta, corrector_variance_exact,
        # ...), and silently dropping the flag would run the wrong sampler
        if k in config:
            print(f">>> CONFIG: Overwriting value for {k}: {config[k]} -> {v}")
        else:
            print(f">>> CONFIG: Setting {k} = {v}")
        config[k] = v

    if jax.process_index() == 0:
        save_path.mkdir(parents=True, exist_ok=False)
        with open(save_path / "config_freeze.yaml", "w") as f:
            yaml.safe_dump(config, f)

    _run_impl(save_path=save_path, **config)
    print("Done. \n")
    return save_path


def _run_impl(
    save_path: pathlib.Path,
    model_path: str,
    data_path: str,
    quantile_path: str,
    start_time: str,
    num_hours: int,
    data_norm_mode: str,
    use_exact_grad: bool = False,
    observation_path: Optional[str] = None,
    data_vars: Sequence[str] = ("psl", "tas", "uas", "vas"),
    num_sampling_steps: int = 256,
    num_samples: int = 1,
    num_corrections: int = 2,
    likelihood_std: Union[float, Sequence[float]] = 1e-2,
    likelihood_gamma: Union[float, Sequence[float]] = 1e-2,
    guidance_prolong: bool = False,
    guidance_anneal: float = 0.0,
    # t=0 data-consistency projection (H6, docs/fidelity/meso128/
    # H6_PREREG.md): project each finished sample onto {x : A(x) = y}.
    # '' = off; 'spectral' | 'bilinear' = band-limited Richardson
    # projection; 'block' = exact piecewise-constant right-inverse.
    t0_project: str = "",
    t0_project_iters: int = 3,
    # sample WITHOUT likelihood guidance while still loading the
    # observation (projection-only designs: H6 point A)
    guidance_off: bool = False,
    # climatological spectral calibration (H7): path to the TRAINING
    # normed h5; each sample's out-of-obs-band annulus amplitudes are
    # rescaled to the training climatology (diffusion/calibrate.py)
    spectral_calibrate: str = "",
    correction_tau: float = 0.5,
    corrector_variance_exact: bool = False,
    seed: int = 0,
    t_step: int = 6,
    s_step: int = 16,
    batch_size: int = 16,
    host_streaming: bool = False,
    sampler_kind: str = "pc",
    sde_eta: float = 0.0,
    long_trajectory_threshold: int = 512,
    ensemble_batch: int = 1,
    denoise_final: bool = False,
    sample_resume_every: int = 0,
):
    import jax
    import jax.numpy as jnp

    run_timestamp = datetime.now().strftime("%Y-%m-%d_%H%M%S")
    world_size = jax.process_count()
    rank = jax.process_index()
    assert num_samples % world_size == 0, "num_samples must be divisible by world_size"
    num_samples_local = num_samples // world_size

    data_vars = sorted(data_vars)
    set_random_seed(seed, rank)

    print(f"STARTING DOWNSCALING AT {run_timestamp} >>>")
    print(f"Running on {world_size} process(es), {jax.device_count()} device(s)")
    print(f"Saving results to {save_path}")

    # -- snapshot ----------------------------------------------------------
    params, snap_config = load_snapshot(model_path)
    markov_window = snap_config["dataset_kwargs"]["train"]["window"]
    markov_order = markov_window // 2
    print(
        f"Loading score network from {model_path}\n"
        f" >  trained on window size: {markov_window}, order: {markov_order}"
    )
    net = build_score_unet(snap_config["network_kwargs"], dtype=jnp.bfloat16)
    process = construct_class_by_name(**snap_config["pipeline_kwargs"])

    # -- observation operator ---------------------------------------------
    A = SpatioTemporalCoarsening(s_step=s_step, t_step=t_step)

    # -- ground truth ------------------------------------------------------
    unnormed_cosmo = data_pipeline.load_processed(
        data_path, data_vars, start_time, num_hours
    )
    if rank == 0:
        unnormed_cosmo.to_file(os.path.join(save_path, "ground_truth.nc"))

    cosmo = data_pipeline.normalize_ds(unnormed_cosmo, quantile_path, data_norm_mode)
    gt_lchw = data_pipeline.ds_to_sorted_np(cosmo, data_vars)  # [L, C, H, W]
    gt = jnp.asarray(data_pipeline.nchw_to_nhwc(gt_lchw))  # [L, H, W, C]
    L, H, W, C = gt.shape

    # -- observation (3 conditioning modes) --------------------------------
    do_condition = True
    observation = None
    if observation_path is None:
        do_condition = False
        print("No observation provided. Sampling without conditioning.")
    elif observation_path == data_path:
        print(f"Conditioning on observations of the ground truth at {observation_path}")
        observation = A(gt)
        # clamp like the reference's slice(0, num_hours, t_step): the loaded
        # dataset may hold fewer than num_hours frames
        observation_ds = cosmo.coarsen_mean(s_step).isel_time(
            np.arange(0, min(num_hours, L), t_step)
        )
    else:
        print(f"Conditioning on provided observation at {observation_path}")
        observation_ds = data_pipeline.load_processed(
            observation_path, data_vars, start_time, num_hours
        )
        observation_ds = data_pipeline.normalize_ds(
            observation_ds, quantile_path, data_norm_mode
        )
        obs_lchw = data_pipeline.ds_to_sorted_np(observation_ds, data_vars)
        observation = jnp.asarray(data_pipeline.nchw_to_nhwc(obs_lchw))

    if do_condition and rank == 0:
        data_pipeline.unnormalize_ds(
            observation_ds, quantile_path, data_norm_mode
        ).to_file(os.path.join(save_path, "observation.nc"))

    # -- score function + guidance -----------------------------------------
    # params and observation cross the jit boundary as arguments (closure
    # capture would embed the full parameter set as HLO constants)
    eps_fn = make_batched_eps_fn(net.apply)

    # multi-chip: shard the window batch over the mesh (sequence parallelism
    # over ICI, SURVEY.md §2.5) — samples stay whole, windows split.
    # Under multiple PROCESSES the cross-process parallelism is sample
    # striping (each process runs its own samples, reference
    # exp/downscaling.py:96-99), so the window mesh must span only this
    # process's local devices — a global mesh would require all processes
    # to execute the same sample together and deadlocks when they stripe.
    win_sharding = None
    _local_only = jax.process_count() > 1
    _n_shard = jax.local_device_count() if _local_only else jax.device_count()
    if _n_shard > 1:
        from climate2weather_tpu.parallel.mesh import make_mesh, window_sharding

        _mesh_devices = jax.local_devices() if _local_only else None
        win_sharding = window_sharding(make_mesh(devices=_mesh_devices))
        print(f"Sharding window batches over {_n_shard} devices"
              + (" (process-local)" if _local_only else ""))
    if do_condition:
        print(f"Observation shape: {observation.shape}")
        sigma = per_channel(
            likelihood_std if not np.isscalar(likelihood_std) else float(likelihood_std),
            C,
        )
        gamma = per_channel(
            likelihood_gamma
            if not np.isscalar(likelihood_gamma)
            else float(likelihood_gamma),
            C,
        )

    from climate2weather_tpu.diffusion.sampler import SAMPLERS

    assert sampler_kind in SAMPLERS, (sampler_kind, sorted(SAMPLERS))
    if sde_eta and sampler_kind != "dpmpp2m":
        raise ValueError(
            f"sde_eta applies to sampler_kind dpmpp2m only (got {sampler_kind!r};"
            " the pc sampler's stochastic knob is num_corrections/tau)"
        )
    if host_streaming and sampler_kind not in ("pc", "dpmpp2m"):
        raise ValueError(
            f"host_streaming implements the pc and dpmpp2m samplers only "
            f"(got {sampler_kind!r})"
        )
    sampler_fn = SAMPLERS[sampler_kind]
    if sampler_kind == "pc":
        sampler_extra = dict(
            corrections=num_corrections,
            tau=correction_tau,
            corrector_variance_exact=corrector_variance_exact,
        )
    elif sampler_kind == "dpmpp2m":
        sampler_extra = dict(sde_eta=float(sde_eta))
    else:
        sampler_extra = {}
    sampler_extra["denoise_final"] = denoise_final
    # Long trajectories use the NCHW memory-bounded sampler: NHWC trajectory
    # buffers with C=4 lane-pad 32x on TPU and blow HBM at year scale
    # (diffusion/long_sampler.py).  Both guidance modes are supported there:
    # detached (analytic adjoint, production) and exact-grad (autodiff
    # through the remat'd window scan).
    use_long = not host_streaming and L > long_trajectory_threshold
    if host_streaming and (t0_project or guidance_off or spectral_calibrate):
        raise ValueError(
            "t0_project / guidance_off / spectral_calibrate are not "
            "implemented for the host-streaming tier (the NCHW long sampler "
            f"covers trajectories up to HBM; got L={L}); on the long path "
            "they run as chunked device post-processing "
            "(diffusion/calibrate.postprocess_long_nchw)"
        )
    calib_target = None
    if spectral_calibrate:
        from climate2weather_tpu.diffusion.calibrate import (
            climatological_annulus_psd,
        )

        calib_target = jnp.asarray(
            climatological_annulus_psd(spectral_calibrate, s_step=s_step)
        )
        print(
            f"Climatological spectral calibration target from "
            f"{spectral_calibrate}: {tuple(calib_target.shape)} "
            "(channel x annulus)"
        )
    if use_long:
        from climate2weather_tpu.diffusion.long_sampler import (
            sample_dpmpp2m_long,
            sample_guided_long,
        )

        # NOT wrapped in an outer jit: stepwise mode jits per chunk of
        # steps internally, so executions stay short (long single
        # executions can be killed as hung by runtime watchdogs) and
        # progress is reported per chunk.  The shared jit cache makes the
        # compiled chunk program reusable across the per-sample loop.
        _long_jit_cache: dict = {}
        # set by the sample loop before each call; read here to name the
        # per-sample resume checkpoint (sample_resume_every > 0)
        _cur_sample = {"id": 0}

        def sample_one(params, observation, noise_nchw, rng):
            guidance = (
                GaussianGuidance(
                    A=A, y=observation, std=sigma, gamma=gamma,
                    exact_grad=use_exact_grad, prolong=guidance_prolong,
                    anneal=float(guidance_anneal),
                )
                if do_condition and not guidance_off
                else None
            )
            common = dict(
                markov_order=markov_order,
                chunk_size=batch_size,
                guidance=guidance,
                steps=num_sampling_steps,
                rng=rng,
                window_sharding=win_sharding,
                steps_per_call=8,
                verbose=rank == 0,
                jit_cache=_long_jit_cache,
                denoise_final=denoise_final,
            )
            if sample_resume_every > 0:
                common["resume_path"] = os.path.join(
                    save_path, f".sample_resume_{_cur_sample['id']:03d}.npz"
                )
                common["resume_every"] = int(sample_resume_every)
            if sampler_kind in ("dpmpp2m", "dpmpp3m"):
                # the multistep carry needs ~5 trajectory buffers (6 at
                # order 3); go bf16 beyond ~4000 frames to stay within a
                # 16 GB chip
                traj_dtype = jnp.bfloat16 if L > 4000 else None
                return sample_dpmpp2m_long(
                    process, eps_fn, params, noise_nchw,
                    traj_dtype=traj_dtype,
                    order=3 if sampler_kind == "dpmpp3m" else 2,
                    sde_eta=float(sde_eta),
                    **common
                )
            return sample_guided_long(
                process,
                eps_fn,
                params,
                noise_nchw,
                corrections=num_corrections,
                tau=correction_tau,
                corrector_variance_exact=corrector_variance_exact,
                **common,
            )
    else:
        # Short trajectories underutilize the chip (few windows per batch);
        # ensemble_batch > 1 vmaps whole samples so the window batches stack
        # — the TPU form of the reference's per-rank ensemble sharding.
        def _sample_impl(params, observation, noise, rng):
            score = WindowScoreFn(
                eps_fn, params, markov_order, chunk_size=batch_size,
                window_sharding=None if ensemble_batch > 1 else win_sharding,
            )
            if do_condition and not guidance_off:
                guidance = GaussianGuidance(
                    A=A,
                    y=observation,
                    std=sigma,
                    gamma=gamma,
                    exact_grad=use_exact_grad,
                    prolong=guidance_prolong,
                    anneal=float(guidance_anneal),
                )
                score_fn = lambda x, t: guidance.guided_eps(score, process, x, t)
            else:
                score_fn = score
            out, nan_flag = sampler_fn(
                process,
                score_fn,
                noise,
                steps=num_sampling_steps,
                rng=rng,
                **sampler_extra,
            )
            if calib_target is not None:
                from climate2weather_tpu.diffusion.calibrate import (
                    calibrate_trajectory,
                )

                out = calibrate_trajectory(out, calib_target, s_step)
            if do_condition and t0_project:
                out = A.project(
                    out, observation,
                    iters=int(t0_project_iters), method=str(t0_project),
                )
            return out, nan_flag

        if ensemble_batch > 1:
            sample_one = jax.jit(
                jax.vmap(_sample_impl, in_axes=(None, None, 0, 0))
            )
        else:
            sample_one = jax.jit(_sample_impl)

    if do_condition and guidance_off:
        print("Likelihood guidance OFF (sampling unconditionally; "
              "observation kept for the t=0 projection).")
    if do_condition and t0_project:
        print(f"t=0 data-consistency projection: method={t0_project}, "
              f"iters={t0_project_iters}")
    print("Starting sampling...")
    eb = max(1, int(ensemble_batch)) if not (use_long or host_streaming) else 1
    for group_start in range(0, num_samples_local, eb):
        group = list(range(group_start, min(group_start + eb, num_samples_local)))
        sample_ids = [rank * num_samples_local + g for g in group]
        sample_id = sample_ids[0]
        print(f"[Rank {rank}] Generating sample(s) {sample_ids}...")
        keys = [
            jax.random.split(jax.random.PRNGKey(derive_seed(seed, "sample", sid)))
            for sid in sample_ids
        ]
        noises = [
            jax.random.normal(
                nk, (L, C, H, W) if use_long else (L, H, W, C), jnp.float32
            )
            for nk, _ in keys
        ]
        noise, skey = noises[0], keys[0][1]
        import time as _time

        t0 = _time.time()
        if host_streaming:
            # trajectory exceeds HBM: host-resident fallback (the TPU
            # equivalent of the reference's BatchedScoreFunction mode)
            from climate2weather_tpu.diffusion.host_stream import (
                HostStreamingScoreFn,
                NumpyCoarsening,
                sample_host,
                sample_host_dpm,
            )

            host_sf = HostStreamingScoreFn(
                net.apply, params, markov_order, batch_size=batch_size
            )
            assert not use_exact_grad, (
                "host_streaming supports the detached guidance mode only"
            )
            assert not guidance_prolong, (
                "host_streaming implements the exact block adjoint only; "
                "prolong guidance runs through the device samplers"
            )
            assert not guidance_anneal, (
                "gamma(t) annealing runs through the device samplers only"
            )
            host_common = dict(
                steps=num_sampling_steps,
                guidance_A=NumpyCoarsening(s_step, t_step) if do_condition else None,
                guidance_y=np.asarray(jax.device_get(observation))
                if do_condition
                else None,
                guidance_std=np.asarray(sigma) if do_condition else 1e-2,
                guidance_gamma=np.asarray(gamma) if do_condition else 1e-2,
                seed=derive_seed(seed, "host", sample_id),
                verbose=rank == 0,
                denoise_final=denoise_final,
            )
            if sampler_kind == "dpmpp2m":
                gen = sample_host_dpm(
                    process,
                    host_sf,
                    np.asarray(jax.device_get(noise)),
                    sde_eta=float(sde_eta),
                    **host_common,
                )
            else:
                gen = sample_host(
                    process,
                    host_sf,
                    np.asarray(jax.device_get(noise)),
                    corrections=num_corrections,
                    tau=correction_tau,
                    corrector_variance_exact=corrector_variance_exact,
                    **host_common,
                )
            nan_flag = False
        else:
            from climate2weather_tpu.utils.fetch import fetch_as_float32

            if eb > 1:
                # shard whole samples over the mesh (ensemble parallel);
                # NamedSharding needs the batch divisible by the mesh size,
                # so pad the run batch up to the next multiple (e.g. the
                # recommended ensemble_batch: 3 on an 8-device mesh runs as
                # 8 with 5 padded duplicates that are sliced off on device
                # before the fetch)
                run_eb = eb
                es = None
                if win_sharding is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    from climate2weather_tpu.parallel.mesh import make_mesh

                    # process-local mesh under multi-process (see the
                    # win_sharding comment above)
                    mesh = make_mesh(devices=_mesh_devices)
                    n_mesh = int(mesh.devices.size)
                    run_eb = -(-eb // n_mesh) * n_mesh
                    es = NamedSharding(mesh, P(("data", "window")))
                noise_b = jnp.stack(noises)
                keys_b = jnp.stack([k for _, k in keys])
                if len(group) < run_eb:  # tile partial tail / sharding pad
                    reps = -(-run_eb // len(group))
                    noise_b = jnp.concatenate([noise_b] * reps)[:run_eb]
                    keys_b = jnp.concatenate([keys_b] * reps)[:run_eb]
                if es is not None:
                    noise_b = jax.device_put(noise_b, es)
                    keys_b = jax.device_put(keys_b, es)
                gen_b, nan_b = sample_one(params, observation, noise_b, keys_b)
                # device-side slice before the (slow) fetch: padded
                # duplicates never cross the link
                gen = fetch_as_float32(gen_b[: len(group)])
                nan_per_sample = np.asarray(jax.device_get(nan_b))[: len(group)]
            else:
                if use_long:
                    _cur_sample["id"] = sample_id
                gen, nan_flag = sample_one(params, observation, noise, skey)
                if use_long and (
                    calib_target is not None
                    or (do_condition and t0_project)
                ):
                    # short-path t=0 post-processing (calibrate, then
                    # project) applied chunk-wise on the NCHW device
                    # trajectory before the fetch
                    from climate2weather_tpu.diffusion.calibrate import (
                        postprocess_long_nchw,
                    )

                    gen = postprocess_long_nchw(
                        gen,
                        calib_target=calib_target,
                        s_step=s_step,
                        observation=observation
                        if (do_condition and t0_project)
                        else None,
                        t_step=t_step,
                        method=str(t0_project) or "spectral",
                        iters=int(t0_project_iters),
                    )
                gen = fetch_as_float32(gen)
                nan_per_sample = np.asarray([bool(jax.device_get(nan_flag))])
        total = _time.time() - t0
        print(
            f"Total sampling time: {total:.2f} s = {total / 60:.3f} min "
            f"= {total / 3600:.4f} h"
        )
        if host_streaming:
            nan_per_sample = np.asarray([False])

        gens = gen if (eb > 1 and not host_streaming) else [gen]
        for sid, g, is_nan in zip(sample_ids, gens, nan_per_sample):
            if is_nan:
                # save the finite group members first, then fail loudly
                continue
            # the long path already returns the writer's [L, C, H, W] layout
            gen_lchw = g if use_long else data_pipeline.nhwc_to_nchw(g)
            sample_ds = data_pipeline.np_to_ds(
                gen_lchw, reference_ds=cosmo, data_vars=data_vars
            )
            sample_ds = data_pipeline.unnormalize_ds(
                sample_ds, quantile_path, data_norm_mode
            )
            sample_ds.to_file(str(save_path / f"gen_sample_{sid:03d}.nc"))
        if nan_per_sample.any():
            bad = [sid for sid, n in zip(sample_ids, nan_per_sample) if n]
            raise FloatingPointError(f"NaN detected in sample(s) {bad}")

    print(f"Saved results to {save_path}")
    return save_path


def _draw_likelihood_hparams(n_channels: int = 4):
    """One (sigma, gamma) draw from the published search space.

    Search-space protocol (reference exp/downscaling.py:290-321): a
    100-point log-uniform grid over [1e-4, 10^0.2]; n_channels-1 independent
    per-channel sigma draws with the final channel reusing the previous one
    (uas/vas share a noise scale), and one scalar gamma.  Uses the global
    numpy stream so callers control seeding per trial.
    """
    grid = np.logspace(-4, 0.2, 100)
    sigmas = [float(s) for s in np.random.choice(grid, size=n_channels - 1)]
    sigmas.append(sigmas[-1])
    return tuple(sigmas), float(np.random.choice(grid))


def sweep_likelihood_hparams(
    save_path: str, config_path: str, trials: int, base_seed: int = 99
):
    """Random search over the likelihood guidance hyperparameters.

    Each trial re-seeds its own draw (so a crashed sweep re-run reproduces
    the same trial sequence), samples a (per-channel sigma, gamma) point,
    and generates the standard 10-sample / 49-hour evaluation ensemble.
    Failures are isolated per trial; a summary table prints at the end.
    """
    outcomes = []
    for n in range(1, trials + 1):
        set_random_seed(base_seed, n)
        sigma, gamma = _draw_likelihood_hparams()
        print(f"Trial {n}: sigma = {sigma}, gamma = {gamma}")
        try:
            out = run(
                save_path=save_path,
                config_path=config_path,
                likelihood_std=sigma,
                likelihood_gamma=gamma,
                num_samples=10,
                num_hours=49,
                num_corrections=0,
                seed=base_seed,
            )
            outcomes.append((n, sigma, gamma, str(out)))
        except Exception as e:
            print(f"Trial {n} failed: {e}")
            outcomes.append((n, sigma, gamma, f"FAILED: {e}"))
    print("Sweep summary:")
    for n, sigma, gamma, res in outcomes:
        print(f"  trial {n}: sigma={sigma} gamma={gamma} -> {res}")
    return outcomes
