"""Forcing-conditioned score network (reference model/score.py:49-50,65-66).

The reference adds a Linear(forcing) projection to the time embedding when a
forcing vector is supplied; this exercises that path end-to-end: forward
sensitivity, additive structure, gradient flow in a training step, and use
inside the sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from climate2weather_tpu.models.score_net import ScoreUNet


def _make(forcing_dim=3):
    C, window = 2, 3
    net = ScoreUNet(
        channels=C * window,
        embedding_dim=16,
        noise_features=8,
        forcing_dim=forcing_dim,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        attention_levels=(),
        dtype=jnp.float32,
    )
    x = jnp.zeros((2, 16, 16, C * window))
    params = net.init(
        jax.random.PRNGKey(0), x, jnp.ones((2,)), jnp.ones((2, forcing_dim))
    )
    return net, params, x


def test_forcing_changes_output_and_is_additive():
    net, params, _ = _make()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 6))
    t = jnp.full((2,), 0.4)
    f0 = jnp.zeros((2, 3))
    f1 = jnp.ones((2, 3))

    out_none = net.apply(params, x, t)  # forcing omitted entirely
    out_f1 = net.apply(params, x, t, f1)
    assert not np.allclose(np.asarray(out_none), np.asarray(out_f1))

    # additive structure: zeroed map_forcing == no forcing at all
    zeroed = jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.zeros_like(p)
        if any(getattr(k, "key", None) == "map_forcing" for k in path)
        else p,
        params,
    )
    out_zeroed = net.apply(zeroed, x, t, f1)
    out_zeroed_none = net.apply(zeroed, x, t)
    np.testing.assert_allclose(
        np.asarray(out_zeroed), np.asarray(out_zeroed_none), atol=1e-6
    )

    # forcing=0 still differs from forcing omitted iff map_forcing has bias
    out_fzero = net.apply(params, x, t, f0)
    bias = params["params"]["map_forcing"]["bias"]
    if np.any(np.asarray(bias) != 0):
        assert not np.allclose(np.asarray(out_none), np.asarray(out_fzero))


def test_forcing_gradients_flow_in_train_step():
    net, params, _ = _make()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 6))
    t = jnp.full((2,), 0.7)
    f = jax.random.normal(jax.random.PRNGKey(3), (2, 3))
    target = jnp.zeros_like(x)

    def loss_fn(p):
        out = net.apply(p, x, t, f)
        return jnp.mean((out - target) ** 2)

    grads = jax.grad(loss_fn)(params)
    g = grads["params"]["map_forcing"]["kernel"]
    assert float(jnp.sum(jnp.abs(g))) > 0.0

    # one optimizer step runs end-to-end
    opt = optax.adamw(1e-3)
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    l0, l1 = loss_fn(params), loss_fn(new_params)
    assert np.isfinite(float(l1)) and float(l1) != float(l0)


def test_forcing_in_sampler():
    """A forcing-conditioned eps function drives the PC sampler."""
    from climate2weather_tpu.diffusion.process import VPCosineProcess
    from climate2weather_tpu.diffusion.sampler import sample

    net, params, _ = _make()
    process = VPCosineProcess()
    f = jnp.ones((1, 3))

    def eps_fn(x, t):
        return net.apply(params, x, jnp.reshape(t, (-1,)), f)

    noise = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 6))
    out, nan_flag = sample(process, eps_fn, noise, steps=4, corrections=0)
    assert out.shape == noise.shape
    assert not bool(nan_flag)
    assert np.all(np.isfinite(np.asarray(out)))
