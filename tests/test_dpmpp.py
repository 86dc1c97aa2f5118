"""DPM-Solver++(2M/3M) samplers: Gaussian recovery and step-efficiency."""

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion import VPCosineProcess
from climate2weather_tpu.diffusion.sampler import (
    logsnr_time_grid,
    sample,
    sample_dpmpp2m,
    sample_dpmpp3m,
)


def exact_gaussian_score(proc):
    def score_fn(x, t):
        mu, sigma = proc.mu(t), proc.sigma(t)
        return sigma * x / (mu**2 + sigma**2)

    return score_fn


def test_logsnr_grid_monotone():
    proc = VPCosineProcess()
    t = np.asarray(logsnr_time_grid(proc, 16))
    assert t[0] == 1.0 and t[-1] == 0.0
    assert np.all(np.diff(t) < 0)
    lam = np.log(np.asarray(proc.mu(t))) - np.log(np.asarray(proc.sigma(t)))
    np.testing.assert_allclose(np.diff(lam), np.diff(lam)[0], rtol=2e-2)


def test_dpmpp_gaussian_recovery(rng):
    proc = VPCosineProcess()
    noise = jax.random.normal(rng, (8192,))
    x, nan = jax.jit(
        lambda n: sample_dpmpp2m(proc, exact_gaussian_score(proc), n, steps=16)
    )(noise)
    assert not bool(nan)
    assert abs(float(x.mean())) < 0.08
    assert abs(float(x.std()) - 1.0) < 0.1


def test_dpmpp_fewer_steps_than_pc(rng):
    """8 lambda-spaced DPM++ steps must beat 8 uniform PC-predictor steps on
    the exact-score harness."""
    proc = VPCosineProcess()
    sf = exact_gaussian_score(proc)
    noise = jax.random.normal(rng, (8192,))
    xd, _ = sample_dpmpp2m(proc, sf, noise, steps=8)
    xp, _ = sample(proc, sf, noise, steps=8)
    err_d = abs(float(xd.std()) - 1.0)
    err_p = abs(float(xp.std()) - 1.0)
    assert err_d < err_p, (err_d, err_p)


def _exact_ode_solution(proc, noise):
    """For unit-normal data the PF-ODE is linear: x(0) = x(1) * s(0)/s(1)
    with s(t) = sqrt(mu^2 + sigma^2) the marginal std."""
    s1 = jnp.sqrt(proc.mu(1.0) ** 2 + proc.sigma(1.0) ** 2)
    s0 = jnp.sqrt(proc.mu(0.0) ** 2 + proc.sigma(0.0) ** 2)
    return noise * (s0 / s1)


def test_dpmpp3m_gaussian_recovery(rng):
    proc = VPCosineProcess()
    noise = jax.random.normal(rng, (8192,))
    x, nan = jax.jit(
        lambda n: sample_dpmpp3m(proc, exact_gaussian_score(proc), n, steps=32)
    )(noise)
    assert not bool(nan)
    assert abs(float(x.mean())) < 0.08
    assert abs(float(x.std()) - 1.0) < 0.1


def test_dpmpp3m_beats_2m_at_32_steps(rng):
    """Per-sample ODE error against the exact linear solution: third order
    must beat second order at the step counts production uses (>=32).
    (Below ~16 steps the quadratic extrapolant overshoots on this schedule
    and 2M wins — measured, which is why dpmpp3m is opt-in, not default.)"""
    proc = VPCosineProcess()
    sf = exact_gaussian_score(proc)
    noise = jax.random.normal(rng, (8192,))
    exact = _exact_ode_solution(proc, noise)
    for steps in (32, 64):
        x2, _ = sample_dpmpp2m(proc, sf, noise, steps=steps)
        x3, n3 = sample_dpmpp3m(proc, sf, noise, steps=steps)
        assert not bool(n3)
        e2 = float(jnp.sqrt(jnp.mean((x2 - exact) ** 2)))
        e3 = float(jnp.sqrt(jnp.mean((x3 - exact) ** 2)))
        assert e3 < e2, (steps, e3, e2)


def test_dpmpp3m_warmup_matches_2m():
    """The first two steps of 3M are first/second-order — identical to 2M;
    trajectories must agree exactly at steps=2 and diverge at steps>=3."""
    proc = VPCosineProcess()
    sf = exact_gaussian_score(proc)
    noise = jax.random.normal(jax.random.PRNGKey(7), (512,))
    x2, _ = sample_dpmpp2m(proc, sf, noise, steps=2)
    x3, _ = sample_dpmpp3m(proc, sf, noise, steps=2)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x2), rtol=1e-6)
    y2, _ = sample_dpmpp2m(proc, sf, noise, steps=4)
    y3, _ = sample_dpmpp3m(proc, sf, noise, steps=4)
    assert not np.allclose(np.asarray(y3), np.asarray(y2))


def test_sde_eta_zero_is_deterministic_2m(rng):
    """sde_eta=0 must reproduce the deterministic solver exactly (the SDE
    coefficients reduce to the 2M ones; steprules.dpm_sde_scalar_coeffs)."""
    proc = VPCosineProcess()
    sf = exact_gaussian_score(proc)
    noise = jax.random.normal(rng, (2048,))
    a, _ = sample_dpmpp2m(proc, sf, noise, steps=16)
    b, _ = sample_dpmpp2m(proc, sf, noise, steps=16, sde_eta=0.0, rng=rng)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6)


def test_sde_dpmpp_gaussian_recovery(rng):
    """The SDE solver must preserve the marginal law: exact N(0, I) score ->
    ~N(0, I) samples at every noise strength."""
    proc = VPCosineProcess()
    sf = exact_gaussian_score(proc)
    noise = jax.random.normal(rng, (8192,))
    for eta in (0.5, 1.0, 2.0):
        x, nan = jax.jit(
            lambda n: sample_dpmpp2m(
                proc, sf, n, steps=16, sde_eta=eta, rng=jax.random.PRNGKey(3)
            )
        )(noise)
        assert not bool(nan)
        assert abs(float(x.mean())) < 0.08, (eta, float(x.mean()))
        assert abs(float(x.std()) - 1.0) < 0.1, (eta, float(x.std()))


def test_sde_eta_reproducible_and_stochastic(rng):
    proc = VPCosineProcess()
    sf = exact_gaussian_score(proc)
    noise = jax.random.normal(rng, (512,))
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    a1, _ = sample_dpmpp2m(proc, sf, noise, steps=8, sde_eta=1.0, rng=k1)
    a2, _ = sample_dpmpp2m(proc, sf, noise, steps=8, sde_eta=1.0, rng=k1)
    b, _ = sample_dpmpp2m(proc, sf, noise, steps=8, sde_eta=1.0, rng=k2)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(b))


def test_sde_eta_requires_rng():
    import pytest

    proc = VPCosineProcess()
    sf = exact_gaussian_score(proc)
    noise = jnp.zeros((8,))
    with pytest.raises(ValueError, match="rng"):
        sample_dpmpp2m(proc, sf, noise, steps=4, sde_eta=1.0)
