"""Child process for the two-process jax.distributed CPU test.

Runs the REAL training loop (climate2weather_tpu/training/loop.py) under
``jax.process_count() == 2`` with gloo CPU collectives, exercising the
multi-host branches VERDICT r1 flagged as untested: the process-strided
``InfiniteSampler`` + ``jax.make_array_from_process_local_data`` global
batch assembly (loop.py streaming path) and checkpoint-based resume
accounting.  Invoked by tests/test_multihost.py; not a test module itself.

Usage: python _multihost_child.py <pid> <nproc> <port> <workdir>
Writes <workdir>/result_<pid>.json with the final step and a param digest.
"""

import json
import os
import sys

# the script lives in tests/; make the repo root importable when invoked as
# a plain subprocess (python tests/_multihost_child.py ...)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, workdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    # force the streaming-loader branch (make_array_from_process_local_data)
    os.environ["C2W_DEVICE_DATA_BUDGET"] = "0"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    import jax.numpy as jnp

    from climate2weather_tpu.training.loop import training_loop
    from climate2weather_tpu.utils.easydict import EasyDict
    from climate2weather_tpu.utils.logging import RunLogger

    window = 3
    run_dir = os.path.join(workdir, "run")
    os.makedirs(run_dir, exist_ok=True)
    common = dict(
        dataset_kwargs=EasyDict(
            train=EasyDict(
                class_name="cosmo_dataset",
                data_path=os.path.join(workdir, "train.h5"),
                num_features=4,
                spatial_res=16,
                cached=True,
                window=window,
                flatten=True,
            )
        ),
        network_kwargs=dict(
            channels=4 * window,
            embedding_dim=32,
            hidden_channels=(8, 8),
            hidden_blocks=(1, 1),
            attention_levels=(),
        ),
        pipeline_kwargs=dict(class_name="vp_cosine"),
        optimizer_kwargs=dict(lr=1e-3, weight_decay=1e-3),
        lr_kwargs=dict(func_name="lr/linear", ref_lr=1e-3, total_ndata=3072),
        batch_size=256,
        batch_gpu=None,
        log_ndata=None,
        status_ndata=None,
        snapshot_ndata=None,
        checkpoint_ndata=1024,
        valid_ndata=None,
        seed=0,
        logger=RunLogger(run_dir, enabled=False),
        compute_dtype=jnp.float32,
        loader_threads=2,
    )

    # phase 1: 8 steps, checkpoints at step 4 and 8
    state = training_loop(run_dir, total_ndata=2048, **common)
    step_phase1 = int(jax.device_get(state.step))

    # phase 2: resume from the step-8 checkpoint and run 4 more steps
    state = training_loop(run_dir, total_ndata=3072, **common)
    step_phase2 = int(jax.device_get(state.step))

    digest = float(
        jax.device_get(
            jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda p: jnp.sum(jnp.abs(p.astype(jnp.float64))), state.params),
            )
        )
    )
    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump(
            {"step_phase1": step_phase1, "step_phase2": step_phase2, "digest": digest},
            f,
        )
    print(f"[proc {pid}] OK: steps {step_phase1}->{step_phase2}, digest {digest}")


if __name__ == "__main__":
    main()
