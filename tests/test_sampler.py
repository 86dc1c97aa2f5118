"""Sampler behavior: Gaussian recovery, NaN guard, corrector effect."""

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion import VPCosineProcess
from climate2weather_tpu.diffusion.sampler import sample, sample_and_check


def test_unconditional_gaussian_recovery(rng):
    """With the exact score of N(0, I) data — eps(x,t) such that the
    marginal stays standard normal: for x ~ N(0, (mu^2+sigma^2) I) the true
    eps-prediction is sigma*x/(mu^2+sigma^2).  Sampling must then produce
    ~N(0, I) samples."""
    proc = VPCosineProcess()

    def score_fn(x, t):
        mu, sigma = proc.mu(t), proc.sigma(t)
        return sigma * x / (mu**2 + sigma**2)

    noise = jax.random.normal(rng, (4096,))
    out, nan = jax.jit(
        lambda n: sample(proc, score_fn, n, steps=128)
    )(noise)
    assert not bool(nan)
    x = np.asarray(out)
    assert abs(x.mean()) < 0.08, x.mean()
    assert abs(x.std() - 1.0) < 0.1, x.std()


def test_nan_guard_raises(rng):
    proc = VPCosineProcess()

    def bad_score(x, t):
        return x * jnp.nan

    noise = jax.random.normal(rng, (16,))
    _, nan = sample(proc, bad_score, noise, steps=2)
    assert bool(nan)
    try:
        sample_and_check(proc, bad_score, noise, steps=2)
        raised = False
    except FloatingPointError:
        raised = True
    assert raised


def test_corrector_changes_result_deterministically(rng):
    proc = VPCosineProcess()
    score_fn = lambda x, t: proc.sigma(t) * x / (proc.mu(t) ** 2 + proc.sigma(t) ** 2)
    noise = jax.random.normal(rng, (64,))
    a1, _ = sample(proc, score_fn, noise, steps=8, corrections=1, tau=0.5, rng=rng)
    a2, _ = sample(proc, score_fn, noise, steps=8, corrections=1, tau=0.5, rng=rng)
    b, _ = sample(proc, score_fn, noise, steps=8)
    np.testing.assert_allclose(a1, a2)  # same rng -> deterministic
    assert not np.allclose(np.asarray(a1), np.asarray(b))  # corrector acts


def test_corrector_variance_inflation_matches_theory(rng):
    """The unadjusted Langevin corrector's stationary std overshoots by
    ~1/sqrt(1 - tau/2) (no Metropolis correction — reference parity,
    src/thor/pipelines.py:81-88).  With the exact N(0, I) score, tau=0.5
    must inflate sample std measurably (the reason production configs ship
    num_corrections: 0) while tau=0.05 stays within a few percent."""
    proc = VPCosineProcess()

    def score_fn(x, t):
        mu, sigma = proc.mu(t), proc.sigma(t)
        return sigma * x / (mu**2 + sigma**2)

    noise = jax.random.normal(rng, (8192,))
    key = jax.random.PRNGKey(1)
    std = {}
    for tau in (0.5, 0.05):
        out, nan = sample(
            proc, score_fn, noise, steps=64, corrections=1, tau=tau, rng=key
        )
        assert not bool(nan)
        std[tau] = float(jnp.std(out))
    assert 1.06 < std[0.5] < 1.20, std  # theory: ~1.15 at full mixing
    assert abs(std[0.05] - 1.0) < 0.05, std


def test_corrector_variance_exact_removes_overshoot(rng):
    """With ``corrector_variance_exact`` the corrector noise is scaled to
    sqrt((2 - tau) delta) (steprules.langevin_noise_scale): under the
    adaptive step rule the Gaussian stationary variance is then exact for
    any target variance, so even the aggressive tau=0.5 must keep sample
    std at ~1.0 where the unadjusted chain inflates to ~1.15 (test above).
    Many corrector steps per predictor step drive the chain to its
    stationary law, making the test sharp."""
    proc = VPCosineProcess()

    def score_fn(x, t):
        mu, sigma = proc.mu(t), proc.sigma(t)
        return sigma * x / (mu**2 + sigma**2)

    noise = jax.random.normal(rng, (8192,))
    key = jax.random.PRNGKey(1)
    out, nan = sample(
        proc, score_fn, noise, steps=64, corrections=3, tau=0.5, rng=key,
        corrector_variance_exact=True,
    )
    assert not bool(nan)
    assert abs(float(jnp.std(out)) - 1.0) < 0.05, float(jnp.std(out))
    # the unadjusted chain under the same heavy-correction schedule
    out_em, _ = sample(
        proc, score_fn, noise, steps=64, corrections=3, tau=0.5, rng=key
    )
    assert float(jnp.std(out_em)) > 1.10, float(jnp.std(out_em))


def test_langevin_noise_scale_values():
    import pytest

    from climate2weather_tpu.diffusion import steprules

    assert np.isclose(steprules.langevin_noise_scale(0.5, 2.0), 2.0)
    assert np.isclose(
        steprules.langevin_noise_scale(0.5, 2.0, variance_exact=True), 3.0**0.5
    )
    with pytest.raises(ValueError):
        steprules.langevin_noise_scale(2.5, 1.0, variance_exact=True)


def test_proc_x0_hook(rng):
    proc = VPCosineProcess()
    score_fn = lambda x, t: jnp.zeros_like(x)
    noise = jax.random.normal(rng, (32,)) * 10
    out, _ = sample(
        proc, score_fn, noise, steps=4, proc_x0=lambda x0: jnp.clip(x0, -1.5, 1.5)
    )
    assert float(jnp.max(jnp.abs(out))) <= 1.5 + 1e-5


def test_denoise_final_applies_proc_x0(rng):
    """The final posterior-mean pass must run through proc_x0 exactly like
    every in-loop x0 estimate (the long/host samplers do; short samplers
    must match — r3 review finding)."""
    from climate2weather_tpu.diffusion.sampler import sample_dpmpp2m

    proc = VPCosineProcess()
    c = 3.0  # point mass OUTSIDE the clamp: x0 -> c, clamp pins it to 1.5

    def score_fn(x, t):
        return (x - proc.mu(t) * c) / proc.sigma(t)

    noise = jax.random.normal(rng, (64,))
    clamp = lambda x0: jnp.clip(x0, -1.5, 1.5)
    for fn in (sample, sample_dpmpp2m):
        den, nan = fn(
            proc, score_fn, noise, steps=8, proc_x0=clamp, denoise_final=True
        )
        assert not bool(nan)
        assert float(jnp.max(jnp.abs(den))) <= 1.5 + 1e-5, fn.__name__


def test_denoise_final_removes_eta_floor(rng):
    """With the exact score of a point mass at c — eps(x,t) = (x - mu c) /
    sigma — the default sampler ends at x = c + eta * eps_pred (the
    reference's sigma(0)=eta residual, src/thor/pipelines.py:40-45), while
    denoise_final returns exactly c."""
    from climate2weather_tpu.diffusion.sampler import sample_dpmpp2m

    proc = VPCosineProcess()
    c = 0.73

    def score_fn(x, t):
        return (x - proc.mu(t) * c) / proc.sigma(t)

    noise = jax.random.normal(rng, (512,))
    for fn in (sample, sample_dpmpp2m):
        plain, nan_p = fn(proc, score_fn, noise, steps=32)
        den, nan_d = fn(proc, score_fn, noise, steps=32, denoise_final=True)
        assert not bool(nan_p) and not bool(nan_d)
        resid_plain = float(jnp.abs(plain - c).max())
        resid_den = float(jnp.abs(den - c).max())
        # the exact-score residual is sigma(0) * eps = O(eta * |x0-c|/eta)
        # -> plain keeps a visible eta-scale floor, denoised collapses it
        assert resid_den < 1e-5, (fn.__name__, resid_den)
        assert resid_den < resid_plain * 1e-2, (fn.__name__, resid_plain, resid_den)
