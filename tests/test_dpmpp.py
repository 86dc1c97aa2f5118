"""DPM-Solver++(2M) sampler: Gaussian recovery and step-efficiency."""

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion import VPCosineProcess
from climate2weather_tpu.diffusion.sampler import (
    logsnr_time_grid,
    sample,
    sample_dpmpp2m,
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
