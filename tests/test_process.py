"""Noise-process identities (SURVEY.md §4: schedule alpha/mu/sigma tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.diffusion import VPCosineProcess


@pytest.fixture
def proc():
    return VPCosineProcess()


def test_schedule_endpoints(proc):
    # alpha(0)=1 (clean data), alpha(1)=eta (pure noise)
    assert np.isclose(float(proc.alpha(0.0)), 1.0)
    assert np.isclose(float(proc.alpha(1.0)), proc.eta, atol=1e-6)
    assert np.isclose(float(proc.sigma(0.0)), proc.eta, atol=1e-6)
    assert np.isclose(float(proc.sigma(1.0)), 1.0, atol=1e-6)


def test_schedule_identity(proc):
    # sigma^2 = 1 - alpha^2 + eta^2 exactly, monotone increasing
    t = jnp.linspace(0, 1, 101)
    a, s = proc.alpha(t), proc.sigma(t)
    np.testing.assert_allclose(s**2, 1 - a**2 + proc.eta**2, rtol=1e-6)
    assert np.all(np.diff(np.asarray(s)) > 0)


def test_perturb_statistics(proc, rng):
    x = jnp.ones((512, 4, 4, 1))
    t = jnp.full((512, 1, 1, 1), 0.5)
    xt, eps = proc.perturb(rng, x, t)
    mu, sigma = float(proc.mu(0.5)), float(proc.sigma(0.5))
    assert abs(float(xt.mean()) - mu) < 0.01
    assert abs(float(xt.std()) - sigma) < 0.02


def test_denoise_renoise_roundtrip(proc, rng):
    x0 = jax.random.normal(rng, (2, 8, 8, 3))
    t = jnp.float32(0.3)
    eps = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    xt = proc.renoise(x0, t, eps)
    np.testing.assert_allclose(proc.denoise(xt, t, eps), x0, atol=1e-5)


def test_loss_of_perfect_model_is_zero(proc, rng):
    # A model that predicts the true eps would give zero loss; here check the
    # loss of the zero-model equals E[eps^2] ~= 1.
    x = jax.random.normal(rng, (64, 8, 8, 2))
    loss = proc.loss(rng, lambda xt, t, f: jnp.zeros_like(xt), x)
    assert 0.8 < float(loss) < 1.2
