"""Checkpoint/snapshot round-trips and latest-resume semantics."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion import VPCosineProcess
from climate2weather_tpu.training.checkpoint import (
    CheckpointIO,
    load_snapshot,
    save_snapshot,
)
from climate2weather_tpu.training.state import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


def _mk_state(tiny_net, steps=0):
    net, params, C, window = tiny_net
    opt = make_optimizer(lambda s: 1e-3, dict())
    state = init_train_state(params, opt, (0.999,))
    if steps:
        step = jax.jit(make_train_step(net.apply, VPCosineProcess(), opt, (0.999,)))
        rng = jax.random.PRNGKey(0)
        batch = jax.random.normal(rng, (1, 4, 16, 16, C * window))
        for i in range(steps):
            state, _ = step(state, batch, jax.random.fold_in(rng, i))
    return state


@pytest.mark.slow
def test_checkpoint_roundtrip(tiny_net, tmp_path):
    state = _mk_state(tiny_net, steps=2)
    path = str(tmp_path / "training-state-0000002.ckpt")
    CheckpointIO(state=state).save(path, verbose=False)

    fresh = _mk_state(tiny_net, steps=0)
    io = CheckpointIO(state=fresh)
    io.load(path, verbose=False)
    restored = io.state_objs["state"]
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
def test_load_latest_picks_highest(tiny_net, tmp_path):
    s1 = _mk_state(tiny_net, steps=1)
    s3 = _mk_state(tiny_net, steps=3)
    CheckpointIO(state=s1).save(str(tmp_path / "training-state-0000001.ckpt"), verbose=False)
    CheckpointIO(state=s3).save(str(tmp_path / "training-state-0000003.ckpt"), verbose=False)
    io = CheckpointIO(state=_mk_state(tiny_net))
    path = io.load_latest(str(tmp_path), verbose=False)
    assert path.endswith("training-state-0000003.ckpt")
    assert int(io.state_objs["state"].step) == 3
    assert CheckpointIO(state=s1).load_latest(str(tmp_path / "nope")) is None


def test_snapshot_roundtrip(tiny_net, tmp_path):
    net, params, C, window = tiny_net
    config = {
        "network_kwargs": {"channels": C * window, "embedding_dim": 32},
        "dataset_kwargs": {"train": {"window": window}},
        "pipeline_kwargs": {"class_name": "vp_cosine"},
    }
    snap = save_snapshot(str(tmp_path), kdata=7, rate_suffix="0.999000",
                         params=params, config=config)
    assert os.path.basename(snap) == "network-snapshot-0000007-0.999000"
    params2, config2 = load_snapshot(snap)
    assert config2 == config
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_async_writer_one_in_flight_and_error_surfacing():
    """submit() must wait for the previous write to FINISH (one host state
    copy alive), and a failed write must raise on the next submit/flush."""
    import threading
    import time

    from climate2weather_tpu.training.checkpoint import AsyncWriter

    w = AsyncWriter()
    running = []
    lock = threading.Lock()
    peak = [0]

    def job():
        with lock:
            running.append(1)
            peak[0] = max(peak[0], len(running))
        time.sleep(0.15)
        with lock:
            running.pop()

    t0 = time.time()
    for _ in range(3):
        w.submit(job)
    # 3rd submit can only start after the 1st and 2nd finished
    assert time.time() - t0 >= 0.25
    w.flush()
    assert peak[0] == 1, "two checkpoint writes overlapped"

    def boom():
        raise OSError("disk full")

    w.submit(boom)
    try:
        w.flush()  # join + error check: the failure surfaces here
        raise AssertionError("expected RuntimeError from failed write")
    except RuntimeError:
        pass
    w.close()
