"""Fabricated-resume path (round 5, H3 recovery).

When `runs/**` is destroyed (VM recycle) but an inference snapshot survives,
`scripts/fabricate_resume_state.py` rebuilds a trainer-loadable
training-state from the snapshot params: step at the true ndata position,
fresh Adam moments, LR-schedule count at the absolute position. These tests
pin that path end-to-end on the tiny CPU slice: fabricate → load_latest →
continue training with correct ndata accounting and LR position.
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import pytest

from climate2weather_tpu.training.loop import training_loop
from climate2weather_tpu.utils.easydict import EasyDict
from climate2weather_tpu.utils.logging import RunLogger

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "fabricate_resume_state.py")


def _run_loop(run_dir, path, total_ndata, lr_total, snapshot_ndata=1024):
    window = 3
    training_loop(
        run_dir,
        dataset_kwargs=EasyDict(
            train=EasyDict(
                class_name="cosmo_dataset", data_path=path, num_features=2,
                spatial_res=16, cached=True, window=window, flatten=True,
            )
        ),
        network_kwargs=dict(
            channels=2 * window, embedding_dim=16, hidden_channels=(8,),
            hidden_blocks=(1,), attention_levels=(),
        ),
        pipeline_kwargs=dict(class_name="vp_cosine"),
        optimizer_kwargs=dict(lr=1e-3, weight_decay=1e-3),
        lr_kwargs=dict(func_name="lr/linear", ref_lr=1e-3, total_ndata=lr_total),
        batch_size=1024,
        batch_gpu=None,
        total_ndata=total_ndata,
        log_ndata=None,
        status_ndata=None,
        snapshot_ndata=snapshot_ndata,
        checkpoint_ndata=None,
        valid_ndata=None,
        seed=0,
        logger=RunLogger(run_dir, enabled=False),
        compute_dtype=jnp.float32,
        loader_threads=1,
    )


@pytest.mark.slow
def test_fabricate_then_resume(tiny_h5, tmp_path):
    path, _ = tiny_h5

    # 1. a short "production" run that leaves only an inference snapshot
    run1 = str(tmp_path / "run1")
    os.makedirs(run1)
    _run_loop(run1, path, total_ndata=2048, lr_total=2048)
    snap = os.path.join(run1, "network-snapshot-0000001-0.999900")
    assert os.path.isdir(snap), os.listdir(run1)

    # 2. fabricate a training state from it in a FRESH run dir
    run2 = str(tmp_path / "run2")
    env = dict(os.environ, C2W_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, SCRIPT, "--snapshot", snap, "--out-dir", run2,
         "--ndata", "1024", "--batch", "1024", "--lr", "1e-3",
         "--total-ndata", "3072", "--ema-rates", "0.9999"],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(os.path.join(run2, "training-state-0000001.ckpt"))
    # the printed LR must sit at the ABSOLUTE ndata position of the new
    # schedule: 1e-3 * (1 - 1024/3072) = 6.667e-4
    assert "lr(step)=6.667e-04" in out.stdout, out.stdout

    # 3. the trainer must resume from it: snapshots at kdata 2 and 3 appear,
    #    kdata 1 does NOT (it would if training had restarted from zero)
    _run_loop(run2, path, total_ndata=3072, lr_total=3072)
    snaps = sorted(
        d for d in os.listdir(run2) if d.startswith("network-snapshot-")
    )
    assert not any("-0000001-" in s for s in snaps), snaps
    assert any("-0000002-" in s for s in snaps), snaps
    assert any("-0000003-" in s for s in snaps), snaps


def test_schedule_count_set_without_touching_adam_count():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from fabricate_resume_state import set_schedule_count

    import optax

    from climate2weather_tpu.training.lr import make_schedule
    from climate2weather_tpu.training.state import make_optimizer

    sched = make_schedule(
        {"func_name": "lr/linear", "ref_lr": 3e-4, "total_ndata": 13631488}, 256
    )
    opt = make_optimizer(sched, {"betas": [0.9, 0.999], "weight_decay": 1e-3})
    params = {"w": jnp.ones((3,))}
    st = set_schedule_count(opt.init(params), 36864)
    adam = st[0]
    assert type(adam).__name__ == "ScaleByAdamState"
    assert int(adam.count) == 0  # fresh bias correction
    assert int(st[-1].count) == 36864  # LR position at the absolute step
    # one optimizer step advances both counts in lockstep
    upd, st2 = opt.update({"w": jnp.ones((3,))}, st, params)
    assert int(st2[0].count) == 1 and int(st2[-1].count) == 36865
    del upd
