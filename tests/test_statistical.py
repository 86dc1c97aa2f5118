"""Statistical acceptance: training must move sampled fields toward the data
distribution (SURVEY.md §4: the reference's de-facto acceptance test is
post-hoc statistics; here it is an automated regression check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.diffusion import VPCosineProcess
from climate2weather_tpu.diffusion.sampler import sample_dpmpp2m
from climate2weather_tpu.diffusion.window import WindowScoreFn, make_batched_eps_fn
from climate2weather_tpu.exp.metrics import sliced_wasserstein_distance
from climate2weather_tpu.models import ScoreUNet
from climate2weather_tpu.training.state import (
    init_train_state,
    make_device_data_train_step,
    make_optimizer,
)


@pytest.mark.slow
def test_training_improves_sample_statistics():
    rng = jax.random.PRNGKey(0)
    C, window, res = 1, 3, 16
    k = window // 2

    # data: smooth random fields with strong spatial correlation, mean ~0.5
    from scipy.ndimage import gaussian_filter

    T = 256
    raw = np.random.RandomState(0).randn(T + 8, res, res)
    data = gaussian_filter(raw, sigma=(0, 3, 3))[: T]
    data = (data / data.std() * 0.7 + 0.5).astype(np.float32)[:, None]  # [T,1,H,W]

    net = ScoreUNet(
        channels=C * window,
        embedding_dim=32,
        noise_features=8,
        hidden_channels=(16, 32),
        hidden_blocks=(1, 1),
        dtype=jnp.float32,
    )
    params = net.init(rng, jnp.zeros((1, res, res, C * window)), jnp.ones((1,)))
    proc = VPCosineProcess()
    opt = make_optimizer(lambda s: 2e-3, dict(weight_decay=1e-4))
    state = init_train_state(params, opt, (0.99,))
    step = jax.jit(make_device_data_train_step(net.apply, proc, opt, window, (0.99,)))

    data_dev = jnp.asarray(data)
    n_windows = T - window + 1
    idx_rng = np.random.RandomState(1)

    def sample_fields(params, key):
        sf = WindowScoreFn(make_batched_eps_fn(net.apply), params, k)
        noise = jax.random.normal(key, (24, res, res, C))
        x, nan = sample_dpmpp2m(proc, sf, noise, steps=16)
        assert not bool(nan)
        return np.asarray(x)[k : -k if k else None, :, :, 0]

    def score(params):
        fields = sample_fields(params, jax.random.fold_in(rng, 123))
        return sliced_wasserstein_distance(
            fields.reshape(fields.shape[0], -1), data[: fields.shape[0], 0].reshape(fields.shape[0], -1)
        )

    w_before = score(state.params)
    losses = []
    for i in range(300):
        idx = idx_rng.randint(0, n_windows, (1, 16)).astype(np.int32)
        state, loss = step(state, data_dev, jnp.asarray(idx), jax.random.fold_in(rng, i))
        losses.append(float(loss))
    w_after = score(state.params)

    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.7, (
        np.mean(losses[:20]), np.mean(losses[-20:])
    )
    assert w_after < w_before * 0.8, (w_before, w_after)
