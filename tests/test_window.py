"""Unfold/fold and chunked window scoring (SURVEY.md §4: fold edge semantics,
property-tested against a straightforward numpy reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.diffusion.window import (
    WindowScoreFn,
    fold_windows,
    make_batched_eps_fn,
    unfold_windows,
)


def np_unfold(x, k):
    """Straightforward numpy reference for the window layout."""
    w = 2 * k + 1
    L, H, W, C = x.shape
    out = np.zeros((L - w + 1, H, W, w * C), x.dtype)
    for i in range(L - w + 1):
        win = x[i : i + w]  # [w, H, W, C]
        out[i] = np.moveaxis(win, 0, 2).reshape(H, W, w * C)
    return out


@pytest.mark.parametrize("k,L", [(1, 5), (2, 11), (3, 7), (0, 4)])
def test_unfold_matches_numpy(k, L):
    x = np.random.RandomState(0).randn(L, 4, 4, 3).astype(np.float32)
    np.testing.assert_allclose(unfold_windows(jnp.asarray(x), k), np_unfold(x, k))


@pytest.mark.parametrize("k,L", [(1, 5), (2, 11), (3, 7), (0, 4)])
def test_fold_unfold_roundtrip(k, L):
    # fold(unfold(x)) == x: centers from interior windows, flanks from edges
    x = jnp.asarray(np.random.RandomState(1).randn(L, 4, 4, 2).astype(np.float32))
    np.testing.assert_allclose(fold_windows(unfold_windows(x, k), k), x)


@pytest.mark.parametrize("chunk", [1, 2, 3, 4, 7, 16])
def test_chunked_equals_full(tiny_net, chunk):
    net, params, C, window = tiny_net
    k = window // 2
    L = 11
    x = jax.random.normal(jax.random.PRNGKey(2), (L, 16, 16, C))
    eps_fn = make_batched_eps_fn(net.apply)
    full = WindowScoreFn(eps_fn, params, k, chunk_size=None)(x, jnp.float32(0.4))
    chunked = WindowScoreFn(eps_fn, params, k, chunk_size=chunk)(x, jnp.float32(0.4))
    np.testing.assert_allclose(full, chunked, atol=2e-5)


def test_single_window_trajectory(tiny_net):
    # L == w: one window; output must equal the raw net output reshaped
    net, params, C, window = tiny_net
    k = window // 2
    x = jax.random.normal(jax.random.PRNGKey(3), (window, 16, 16, C))
    sf = WindowScoreFn(make_batched_eps_fn(net.apply), params, k)
    out = sf(x, jnp.float32(0.5))
    assert out.shape == x.shape
    win = unfold_windows(x, k)
    raw = net.apply(params, win, jnp.full((1,), 0.5))
    np.testing.assert_allclose(out, fold_windows(raw, k), atol=1e-6)
