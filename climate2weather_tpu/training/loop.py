"""EDM2-style ndata-driven training loop, TPU-native.

Capability parity with the reference ``training_loop`` (training_loop.py:21-391):

- batch math: ``batch_gpu_total = batch_size // world_size``, accumulation
  rounds = ``batch_gpu_total // batch_gpu``, exact-divisibility asserts
  (training_loop.py:58-72)
- interval-driven side effects on ndata multiples: status prints, EMA
  snapshots, in-loop unconditional validation sampling, scalar logging,
  checkpoint save (training_loop.py:206-363)
- always-on resume via ``load_latest`` + ``InfiniteSampler(start_idx=
  cur_ndata)`` (training_loop.py:132-139,164-171), and ``slice_ndata`` for
  time-limited scheduler jobs (training_loop.py:141-152)

TPU-first: the whole optimization step (accumulation scan, grad mean, AdamW,
EMA lerp) is one jit-compiled function; the global batch is sharded over the
mesh's data axis so XLA emits the gradient all-reduce over ICI; host threads
prefetch NHWC batches.  bf16 compute replaces the reference's fp16-mixed
autocast (fp32 params and schedule math throughout).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.data.dataset import InfiniteSampler, PrefetchLoader
from climate2weather_tpu.diffusion.sampler import sample as pc_sample
from climate2weather_tpu.diffusion.window import WindowScoreFn, make_batched_eps_fn
from climate2weather_tpu.models.score_net import build_score_unet
from climate2weather_tpu.parallel.mesh import make_mesh, replicated, batch_sharding
from climate2weather_tpu.training.checkpoint import (
    AsyncWriter,
    CheckpointIO,
    prune_checkpoints,
    save_snapshot,
)
from climate2weather_tpu.training.ema import rate_key
from climate2weather_tpu.training.lr import make_schedule
from climate2weather_tpu.training.state import (
    init_train_state,
    make_device_data_train_step,
    make_optimizer,
    make_train_step,
    upload_dataset,
)
from climate2weather_tpu.utils.easydict import EasyDict
from climate2weather_tpu.utils.logging import RunLogger, trajectory_to_imgrid
from climate2weather_tpu.utils.registry import construct_class_by_name
from climate2weather_tpu.utils.seeding import derive_seed, set_random_seed


def _fetch_with_heartbeat(tree, interval_s: float = 10.0):
    """device_get a pytree leaf by leaf, printing a heartbeat line while
    the transfer runs.

    The ~1.4 GB training-state fetch takes tens of seconds over a slow
    accelerator link and is otherwise completely silent — to the stall
    supervisor a slow-but-alive fetch is indistinguishable from a wedged
    runtime (observed live: a checkpoint-boundary fetch stalled for
    minutes and was killed).  Any output line resets the supervisor's
    idle clock, so a heartbeat keeps slow fetches alive while a true
    wedge (no leaf completing within the stall timeout) is still caught.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    t_last = time.monotonic()
    for i, leaf in enumerate(leaves):
        out.append(np.asarray(jax.device_get(leaf)))
        now = time.monotonic()
        if now - t_last >= interval_s:
            print(
                f"checkpoint fetch: {i + 1}/{len(leaves)} arrays", flush=True
            )
            t_last = now
    return jax.tree_util.tree_unflatten(treedef, out)


def training_loop(
    run_dir,
    *,
    dataset_kwargs,
    network_kwargs,
    pipeline_kwargs,
    optimizer_kwargs,
    lr_kwargs,
    batch_size,
    batch_gpu,
    total_ndata,
    log_ndata,
    status_ndata,
    snapshot_ndata,
    checkpoint_ndata,
    valid_ndata,
    ema_kwargs=None,
    slice_ndata=None,
    seed=0,
    loss_scaling=1,
    logger: RunLogger | None = None,
    mesh=None,
    compute_dtype=jnp.bfloat16,
    loader_threads=2,
    device_data="auto",
):
    prev_status_time = time.time()
    # interval == 0 disables the corresponding side effect
    norm = lambda v: None if not v else v
    log_ndata, status_ndata = norm(log_ndata), norm(status_ndata)
    snapshot_ndata, checkpoint_ndata = norm(snapshot_ndata), norm(checkpoint_ndata)
    valid_ndata, slice_ndata = norm(valid_ndata), norm(slice_ndata)
    set_random_seed(seed, jax.process_index())
    # per-process stream: rank-0-only side effects (validation sampling).
    # Everything entering the jitted global program (init, per-step loss rng)
    # must be IDENTICAL across processes — replicated jit arguments are
    # asserted equal by jax, and the reference's DDP likewise broadcasts
    # rank-0 weights (params differing per rank would silently diverge).
    rng = jax.random.PRNGKey(derive_seed(seed, jax.process_index()))
    shared_rng = jax.random.PRNGKey(derive_seed(seed, "global-train-stream"))

    mesh = mesh if mesh is not None else make_mesh()
    n_devices = mesh.devices.size
    world_size = n_devices  # device-level data parallelism

    # -- batch math (training_loop.py:58-72) -------------------------------
    batch_gpu_total = batch_size // world_size
    if batch_gpu is None or batch_gpu > batch_gpu_total:
        batch_gpu = batch_gpu_total
    num_accumulation_rounds = batch_gpu_total // batch_gpu
    assert batch_size == batch_gpu * num_accumulation_rounds * world_size
    assert total_ndata % batch_size == 0
    assert slice_ndata is None or slice_ndata % batch_size == 0
    assert log_ndata is None or log_ndata % batch_size == 0
    assert status_ndata is None or status_ndata % batch_size == 0
    assert snapshot_ndata is None or (
        snapshot_ndata % batch_size == 0 and snapshot_ndata % 1024 == 0
    )
    assert checkpoint_ndata is None or (
        checkpoint_ndata % batch_size == 0 and checkpoint_ndata % 1024 == 0
    )
    # without this, a valid_ndata not divisible by batch_size silently
    # disables in-loop validation forever (cur_ndata % valid_ndata never 0)
    assert valid_ndata is None or valid_ndata % batch_size == 0

    # -- dataset -----------------------------------------------------------
    print("Setting up datasets...")
    dataset_kwargs = EasyDict.from_nested(dataset_kwargs)
    train_dataset = construct_class_by_name(**dataset_kwargs.train)
    if "valid" in dataset_kwargs:
        print("WARNING: Validation dataset provided but currently not supported.")

    # -- network -----------------------------------------------------------
    print("Setting up network...")
    net = build_score_unet(network_kwargs, dtype=compute_dtype)
    sample_item = train_dataset[0]
    print(f"Data shape: {sample_item.shape}")
    shared_rng, init_rng = jax.random.split(shared_rng)
    params = net.init(
        init_rng,
        jnp.zeros((1,) + sample_item.shape, jnp.float32),
        jnp.ones((1,), jnp.float32),
    )
    if jax.process_index() == 0:
        from climate2weather_tpu.utils.summary import print_module_summary

        print_module_summary(params, name="score_unet")

    # -- process / optimizer / EMA / state ---------------------------------
    process = construct_class_by_name(**pipeline_kwargs)
    schedule = make_schedule(lr_kwargs, batch_size)
    optimizer = make_optimizer(schedule, optimizer_kwargs)
    ema_rates = tuple((ema_kwargs or {}).get("rates", (0.9999,)))
    state = init_train_state(params, optimizer, ema_rates)

    # -- device-resident dataset decision ----------------------------------
    # If the whole [T, C, H, W] store fits a configurable HBM budget, keep
    # it on device and gather windows in HBM: only int32 indices cross the
    # host link per step.  Essential when the host-device link is slow
    # (measured ~60 MB/s on this relay vs 100+ MB per batch).
    window = int(dataset_kwargs.train.window)
    data_nbytes = int(np.prod(train_dataset.raw_data_shape)) * 4
    budget = int(os.environ.get("C2W_DEVICE_DATA_BUDGET", 8 << 30))
    if device_data == "auto":
        if data_nbytes <= budget:
            device_data_dtype = jnp.float32
        elif data_nbytes // 2 <= budget:
            device_data_dtype = jnp.bfloat16
        else:
            device_data_dtype = None
    elif device_data:
        if data_nbytes <= budget:
            device_data_dtype = jnp.float32
        elif data_nbytes // 2 <= budget:
            device_data_dtype = jnp.bfloat16
        else:
            print(
                f"WARNING: device_data requested but dataset "
                f"({data_nbytes / 2**30:.1f} GiB) exceeds the HBM budget even "
                f"in bf16; falling back to the streaming loader."
            )
            device_data_dtype = None
    else:
        device_data_dtype = None
    use_device_data = device_data_dtype is not None

    if use_device_data:
        train_step = make_device_data_train_step(
            net.apply, process, optimizer, window, ema_rates, loss_scaling,
            remat=bool(int(os.environ.get("C2W_REMAT", "0"))),
        )
    else:
        train_step = make_train_step(
            net.apply, process, optimizer, ema_rates, loss_scaling,
            channels_first=True,
        )

    # -- resume ------------------------------------------------------------
    # cur_ndata is derived as step * batch_size, so a checkpoint is only
    # resumable with the batch size it was trained with; the meta blob makes
    # a mismatch a hard error instead of silent progress corruption.
    ckpt_io = CheckpointIO(state=state, meta={"batch_size": batch_size})
    loaded = ckpt_io.load_latest(run_dir)
    if loaded is not None:
        state = ckpt_io.state_objs["state"]
        saved_bs = int(ckpt_io.state_objs["meta"]["batch_size"])
        if saved_bs != batch_size:
            raise ValueError(
                f"Checkpoint was written with --batch {saved_bs}; resuming "
                f"with --batch {batch_size} would corrupt the ndata/LR/data "
                f"stream accounting. Use the original batch size."
            )
    start_ndata = int(jax.device_get(state.step)) * batch_size
    stop_at_ndata = total_ndata
    if slice_ndata is not None:
        granularity = (
            checkpoint_ndata
            if checkpoint_ndata is not None
            else snapshot_ndata
            if snapshot_ndata is not None
            else batch_size
        )
        slice_end = (start_ndata + slice_ndata) // granularity * granularity
        stop_at_ndata = min(stop_at_ndata, slice_end)
    assert stop_at_ndata > start_ndata or start_ndata >= total_ndata
    print(f"Training from {start_ndata // 1000} kdata to {stop_at_ndata // 1000} kdata:")
    print(
        f"Batch size: {batch_size} (per device: {batch_gpu}; "
        f"accumulation rounds: {num_accumulation_rounds})"
    )

    # -- compile the sharded train step ------------------------------------
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    if use_device_data:
        train_step = jax.jit(
            train_step,
            in_shardings=(rep, rep, bsh, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
    else:
        train_step = jax.jit(
            train_step,
            in_shardings=(rep, bsh, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
    state = jax.device_put(state, rep)

    # -- input pipeline ----------------------------------------------------
    # Sampler is process-strided; device-level sharding happens via
    # device_put of the host batch (single-process covers all devices).
    sampler = InfiniteSampler(
        dataset_size=len(train_dataset),
        rank=jax.process_index(),
        num_replicas=jax.process_count(),
        shuffle=True,
        seed=seed,
        start_idx=start_ndata,
    )
    local_batch = batch_size // jax.process_count()
    if use_device_data:
        print(
            f"Uploading dataset to device HBM "
            f"({data_nbytes / 2**30:.2f} GiB fp32 as "
            f"{jnp.dtype(device_data_dtype).name}) ..."
        )
        source = (
            train_dataset._cache
            if train_dataset._cache is not None
            else train_dataset._reader()
        )
        device_data_arr = upload_dataset(
            source,
            train_dataset.raw_data_shape[0],
            dtype=device_data_dtype,
            sharding=rep,
        )
        index_iter = iter(sampler)
        loader = None
        print("Dataset resident on device; per-step transfer is indices only.")
    else:
        loader = PrefetchLoader(
            train_dataset,
            sampler,
            batch_size=local_batch // num_accumulation_rounds,
            rounds=num_accumulation_rounds,
            num_threads=loader_threads,
        ).start()

    # -- snapshot config (data-only; rebuildable without pickles) ----------
    snap_config = {
        "network_kwargs": EasyDict(network_kwargs).to_plain(),
        "dataset_kwargs": EasyDict(dataset_kwargs).to_plain(),
        "pipeline_kwargs": EasyDict(pipeline_kwargs).to_plain(),
    }

    writer = AsyncWriter()
    cur_ndata = start_ndata
    prev_status_ndata = cur_ndata
    total_elapsed_time = 0.0
    losses_accum = []  # device scalars; synced only at log time
    last_loss = None  # single live device scalar for the status-tick drain
    valid_markov_order = dataset_kwargs.train.window // 2

    # jitted once; params cross the boundary as an argument (closure capture
    # would embed them as HLO constants and recompile per validation)
    valid_eps_fn = make_batched_eps_fn(net.apply)

    @jax.jit
    def valid_sample(ema_params, noise, key):
        sf = WindowScoreFn(valid_eps_fn, ema_params, valid_markov_order)
        return pc_sample(process, sf, noise, steps=100, rng=key)

    while True:
        done = cur_ndata >= stop_at_ndata

        # ---- status (training_loop.py:210-231)
        if (
            status_ndata is not None
            and (done or cur_ndata % status_ndata == 0)
            and (cur_ndata != start_ndata or start_ndata == 0)
        ):
            if last_loss is not None:
                # drain the async dispatch queue so sec/tick measures device
                # time, not enqueue time (device_get: block_until_ready is a
                # no-op under remote-relay execution)
                jax.device_get(last_loss)
            cur_time = time.time()
            total_elapsed_time += cur_time - prev_status_time
            denom = max(cur_ndata - prev_status_ndata, 1)
            # sec/kdata from tick WALL time: step dispatch is async, so the
            # per-step accumulator would only measure enqueue latency
            print(
                " +++ ".join(
                    [
                        "Status:",
                        f"{cur_ndata} / {total_ndata} ({cur_ndata / total_ndata:.2%})",
                        f"{total_elapsed_time:.2f} sec total",
                        f"{cur_time - prev_status_time:.2f} sec/tick",
                        f"{(cur_time - prev_status_time) / denom * 1e3:.3f} sec/kdata",
                    ]
                ),
                flush=True,
            )
            prev_status_ndata = cur_ndata
            prev_status_time = cur_time

        # ---- EMA snapshot (training_loop.py:234-267)
        # fp16 payload like the reference.  The device->host FETCH runs on
        # the MAIN thread: device reads issued from a second thread starve
        # behind the continuously-queued training steps on relay-style
        # runtimes (observed: a 144 MB snapshot fetch making zero progress
        # for 12+ minutes while training dispatched ahead).  Only the
        # serialize+disk write goes to the writer thread.
        if (
            snapshot_ndata is not None
            # `done or`: the final EMA snapshot must be written even when the
            # stop point is not a snapshot_ndata multiple (checkpoint/status/
            # log have the same clause)
            and (done or cur_ndata % snapshot_ndata == 0)
            and cur_ndata != start_ndata
            and jax.process_index() == 0
        ):
            for rate in ema_rates:
                snap_host = jax.device_get(
                    jax.tree.map(
                        lambda p: p.astype(jnp.float16),
                        state.emas[rate_key(rate)],
                    )
                )
                writer.submit(
                    lambda nd=cur_ndata, rk=rate_key(rate), sp=snap_host: (
                        save_snapshot(
                            run_dir, nd // 1000, rk, sp, snap_config,
                            half_precision=True,
                        )
                    )
                )

        # ---- validation sampling (training_loop.py:270-325)
        if (
            valid_ndata is not None
            and logger is not None  # results are only consumed by the logger
            and cur_ndata % valid_ndata == 0
            and (cur_ndata != start_ndata or start_ndata == 0)
            and jax.process_index() == 0
        ):
            rng, vrng, nrng = jax.random.split(rng, 3)
            noise = jax.random.normal(
                nrng,
                (
                    dataset_kwargs.train.window,
                    dataset_kwargs.train.spatial_res,
                    dataset_kwargs.train.spatial_res,
                    dataset_kwargs.train.num_features,
                ),
                jnp.float32,
            )
            for rate in ema_rates:
                gen, nan_flag = valid_sample(
                    state.emas[rate_key(rate)], noise, vrng
                )
                gen = jax.device_get(gen)
                if logger is not None:
                    logger.log_image(
                        f"gen_sample-{rate_key(rate)}",
                        trajectory_to_imgrid(gen),
                        cur_ndata // 1000,
                    )
                    from climate2weather_tpu.utils.logging import (
                        value_histogram_image,
                    )

                    logger.log_image(
                        f"value_histogram-{rate_key(rate)}",
                        value_histogram_image(gen),
                        cur_ndata // 1000,
                    )
                    logger.log(
                        {
                            "train/kdata": cur_ndata // 1000,
                            f"valid/sample_nan-{rate_key(rate)}": bool(nan_flag),
                            f"valid/sample_mean-{rate_key(rate)}": float(np.mean(gen)),
                            f"valid/sample_std-{rate_key(rate)}": float(np.std(gen)),
                        }
                    )

        # ---- scalar logging (training_loop.py:333-350)
        if (
            log_ndata is not None
            and (done or cur_ndata % log_ndata == 0)
            and cur_ndata != start_ndata
        ):
            if logger is not None:
                logger.log(
                    {
                        "train/loss": float(np.mean(jax.device_get(losses_accum)))
                        if losses_accum
                        else None,
                        "train/kdata": cur_ndata // 1000,
                        # exact position: kdata is a lossy // 1000 (several
                        # log events can share one kdata), but resume parity
                        # checks need the precise stream position
                        "train/ndata": cur_ndata,
                        "train/elapsed_time": total_elapsed_time,
                        "train/lr": float(schedule(cur_ndata // batch_size)),
                    }
                )
            losses_accum = []  # cleared regardless of logger (device buffers!)

        # ---- checkpoint (training_loop.py:353-363)
        # Same split as snapshots: main-thread fetch (writer-thread device
        # reads starve behind the dispatch queue), writer-thread file write.
        if (
            checkpoint_ndata is not None
            and (done or cur_ndata % checkpoint_ndata == 0)
            and cur_ndata != start_ndata
            and jax.process_index() == 0
        ):
            state_host = _fetch_with_heartbeat(state)
            ckpt_path = os.path.join(
                run_dir, f"training-state-{cur_ndata // 1000:07d}.ckpt"
            )
            keep_last = int(os.environ.get("C2W_CKPT_KEEP", 0))

            def _write_ckpt(sc=state_host, path=ckpt_path, keep=keep_last):
                CheckpointIO(
                    state=sc, meta={"batch_size": batch_size}
                ).save(path)
                if keep > 0:
                    prune_checkpoints(run_dir, keep)

            writer.submit(_write_ckpt)

        if done:
            break

        # ---- optional profiler trace (SURVEY.md §5: tracing first-class) --
        profile_dir = os.environ.get("C2W_PROFILE_DIR")
        if profile_dir and cur_ndata == start_ndata + 2 * batch_size:
            jax.profiler.start_trace(profile_dir)
        if profile_dir and cur_ndata == start_ndata + 6 * batch_size:
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {profile_dir}")

        # ---- optimization step -------------------------------------------
        # fold in the step index: the per-step (t, eps) draws replay exactly
        # across checkpoint resume, matching the sampler's ndata-resume
        step_rng = jax.random.fold_in(shared_rng, cur_ndata // batch_size)
        if use_device_data:
            idx = np.fromiter(
                (next(index_iter) for _ in range(local_batch)), np.int32,
                count=local_batch,
            ).reshape(num_accumulation_rounds, -1)
            if jax.process_count() > 1:
                global_shape = (
                    idx.shape[0],
                    batch_size // num_accumulation_rounds,
                )
                idx = jax.make_array_from_process_local_data(
                    bsh, idx, global_shape
                )
            else:
                idx = jax.device_put(idx, bsh)
            state, loss = train_step(state, device_data_arr, idx, step_rng)
        else:
            batch = next(loader)  # [rounds, B_local, w*C, H, W]
            if jax.process_count() > 1:
                global_shape = (
                    batch.shape[0],
                    batch_size // num_accumulation_rounds,
                ) + batch.shape[2:]
                batch = jax.make_array_from_process_local_data(
                    bsh, batch, global_shape
                )
            else:
                batch = jax.device_put(batch, bsh)
            state, loss = train_step(state, batch, step_rng)
        last_loss = loss
        if log_ndata is not None:  # only the log block drains the list —
            # appending with logging disabled would grow device buffers
            # without bound on long runs
            losses_accum.append(loss)  # async; no host sync in the hot loop
        cur_ndata += batch_size

    writer.close()
    if loader is not None:
        loader.stop()
    print("Training complete.")
    return state
