"""Child process for the two-process guided-downscaling test.

Runs the REAL prediction driver (climate2weather_tpu/exp/downscaling.py
``_run_impl``) under ``jax.process_count() == 2`` with gloo CPU
collectives: sample ids stripe across processes (reference
exp/downscaling.py:96-99) while each process shards its window batches
over its own 2 local devices — the process-local window mesh
(downscaling.py win_sharding).  Invoked by tests/test_multihost.py.

Usage: python _multihost_sample_child.py <pid> <nproc> <port> <workdir>
"""

import json
import os
import sys

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

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2

    import pathlib

    from climate2weather_tpu.exp.downscaling import _run_impl

    save = pathlib.Path(workdir) / "exp"
    save.mkdir(exist_ok=True)
    _run_impl(
        save_path=save,
        model_path=os.path.join(workdir, "snap"),
        data_path=os.path.join(workdir, "merged.nc"),
        quantile_path=os.path.join(workdir, "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=13,
        data_norm_mode="quant95",
        observation_path=os.path.join(workdir, "merged.nc"),
        num_sampling_steps=2,
        num_samples=2,  # 1 per process, id-striped
        num_corrections=0,
        likelihood_std=0.01,
        likelihood_gamma=0.01,
        t_step=6,
        s_step=4,
        batch_size=4,
        seed=0,
    )
    with open(os.path.join(workdir, f"sample_result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "done": True}, f)


if __name__ == "__main__":
    main()
