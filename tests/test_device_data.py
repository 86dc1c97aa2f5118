"""Device-resident dataset path: gather correctness + step parity."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion import VPCosineProcess
from climate2weather_tpu.training.state import (
    init_train_state,
    make_device_data_train_step,
    make_optimizer,
    make_train_step,
    upload_dataset,
)


def test_upload_dataset_roundtrip():
    data = np.random.RandomState(0).randn(20, 2, 8, 8).astype(np.float32)
    arr = upload_dataset(data, 20, dtype=jnp.float32, chunk_frames=7)
    np.testing.assert_array_equal(np.asarray(arr), data)


@pytest.mark.slow
def test_device_step_matches_streaming_step(tiny_net):
    net, params, C, window = tiny_net
    proc = VPCosineProcess()
    opt = make_optimizer(lambda s: 1e-3, dict())

    rng = jax.random.PRNGKey(0)
    T = 24
    data = np.asarray(
        jax.random.normal(jax.random.fold_in(rng, 9), (T, C, 16, 16)), np.float32
    )
    idx = np.array([[0, 4, 9, 13]], np.int32)  # [rounds=1, B=4]

    # streaming batch, channels-first layout [rounds, B, w*C, H, W]
    batch = np.stack(
        [data[i : i + window].reshape(window * C, 16, 16) for i in idx[0]]
    )[None]

    state_a = init_train_state(params, opt, (0.999,))
    state_b = init_train_state(params, opt, (0.999,))
    step_stream = jax.jit(
        make_train_step(net.apply, proc, opt, (0.999,), channels_first=True)
    )
    step_device = jax.jit(
        make_device_data_train_step(net.apply, proc, opt, window, (0.999,))
    )
    sa, loss_a = step_stream(state_a, jnp.asarray(batch), rng)
    sb, loss_b = step_device(state_b, jnp.asarray(data), jnp.asarray(idx), rng)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    for x, y in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@pytest.mark.slow
def test_device_step_accumulation(tiny_net):
    net, params, C, window = tiny_net
    proc = VPCosineProcess()
    opt = make_optimizer(lambda s: 1e-3, dict())
    data = jnp.asarray(np.random.RandomState(1).randn(24, C, 16, 16), jnp.float32)
    idx = jnp.asarray([[0, 2], [5, 7]], jnp.int32)  # 2 rounds x 2
    state = init_train_state(params, opt, (0.999,))
    step = jax.jit(make_device_data_train_step(net.apply, proc, opt, window, (0.999,)))
    state, loss = step(state, data, idx, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
