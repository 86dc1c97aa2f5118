"""Likelihood guidance: analytic adjoint vs autodiff; operator adjoint test."""

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion import (
    GaussianGuidance,
    SpatioTemporalCoarsening,
    VPCosineProcess,
)
from climate2weather_tpu.diffusion.guidance import per_channel


def test_coarsening_forward_shapes():
    A = SpatioTemporalCoarsening(s_step=4, t_step=3)
    x = jnp.ones((12, 16, 16, 2))
    y = A(x)
    assert y.shape == (4, 4, 4, 2)
    np.testing.assert_allclose(y, 1.0)


def test_coarsening_adjoint_identity():
    # <A x, v> == <x, A^T v> for random x, v — the defining adjoint property
    A = SpatioTemporalCoarsening(s_step=4, t_step=3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(12, 16, 16, 2).astype(np.float32))
    v = jnp.asarray(rng.randn(4, 4, 4, 2).astype(np.float32))
    lhs = jnp.sum(A(x) * v)
    rhs = jnp.sum(x * A.adjoint(v, out_len=12))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_adjoint_matches_vjp():
    A = SpatioTemporalCoarsening(s_step=2, t_step=2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(7, 8, 8, 3).astype(np.float32))
    v = jnp.asarray(rng.randn(4, 4, 4, 3).astype(np.float32))
    _, vjp = jax.vjp(A.__call__, x)
    (want,) = vjp(v)
    got = A.adjoint(v, out_len=7)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_analytic_guidance_matches_autodiff_detached():
    """The production (detached) analytic path must equal autodiff through the
    linear x0 map with eps detached — the reference's exact_grad=False
    semantics (src/thor/score.py:48-57)."""
    proc = VPCosineProcess()
    A = SpatioTemporalCoarsening(s_step=2, t_step=2)
    rng = jax.random.PRNGKey(0)
    L, H, W, C = 6, 8, 8, 2
    x = jax.random.normal(rng, (L, H, W, C))
    y = jax.random.normal(jax.random.fold_in(rng, 1), (3, 4, 4, C))
    std = per_channel([0.2, 0.3], C)
    gamma = 7e-4
    t = jnp.float32(0.37)

    # a fixed nonlinear "score" — deterministic stand-in for the UNet
    def score_fn(xx, tt):
        return jnp.tanh(xx) * 0.5

    g = GaussianGuidance(A=A, y=y, std=std, gamma=gamma, exact_grad=False)
    got = g.guided_eps(score_fn, proc, x, t)

    # autodiff reference of the same (detached) objective
    eps = score_fn(x, t)
    mu, sigma = proc.mu(t), proc.sigma(t)
    var = std**2 + gamma * (sigma / mu) ** 2

    def log_p(xx):
        x0 = (xx - sigma * jax.lax.stop_gradient(eps)) / mu
        err = y - A(x0)
        return -jnp.sum(err**2 / var) / 2.0

    want = eps - sigma * jax.grad(log_p)(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_exact_grad_path_runs_and_differs():
    proc = VPCosineProcess()
    A = SpatioTemporalCoarsening(s_step=2, t_step=2)
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, (6, 8, 8, 2))
    y = jax.random.normal(jax.random.fold_in(rng, 2), (3, 4, 4, 2))

    def score_fn(xx, tt):
        return jnp.tanh(xx) * 0.5  # nonlinear => exact grad differs

    g_det = GaussianGuidance(A=A, y=y, std=0.1, gamma=1e-3, exact_grad=False)
    g_ex = GaussianGuidance(A=A, y=y, std=0.1, gamma=1e-3, exact_grad=True)
    e1 = g_det.guided_eps(score_fn, proc, x, jnp.float32(0.5))
    e2 = g_ex.guided_eps(score_fn, proc, x, jnp.float32(0.5))
    assert e1.shape == e2.shape == x.shape
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_per_channel_gamma_matches_autodiff():
    """Per-channel gamma (the round-4 sweep's decisive axis) must enter the
    likelihood variance channelwise: var_c = std_c^2 + gamma_c (sigma/mu)^2."""
    proc = VPCosineProcess()
    A = SpatioTemporalCoarsening(s_step=2, t_step=2)
    rng = jax.random.PRNGKey(7)
    L, H, W, C = 6, 8, 8, 4
    x = jax.random.normal(rng, (L, H, W, C))
    y = jax.random.normal(jax.random.fold_in(rng, 3), (3, 4, 4, C))
    std = per_channel([0.17, 0.043, 0.33, 0.33], C)
    gamma = per_channel([0.003, 0.003, 0.04, 0.01], C)
    t = jnp.float32(0.41)

    def score_fn(xx, tt):
        return jnp.tanh(xx) * 0.5

    g = GaussianGuidance(A=A, y=y, std=std, gamma=gamma, exact_grad=False)
    got = g.guided_eps(score_fn, proc, x, t)

    eps = score_fn(x, t)
    mu, sigma = proc.mu(t), proc.sigma(t)
    var = std**2 + gamma * (sigma / mu) ** 2  # channelwise broadcast

    def log_p(xx):
        x0 = (xx - sigma * jax.lax.stop_gradient(eps)) / mu
        err = y - A(x0)
        return -jnp.sum(err**2 / var) / 2.0

    want = eps - sigma * jax.grad(log_p)(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # and it must actually differ from the scalar-mean-gamma guidance
    g_scalar = GaussianGuidance(
        A=A, y=y, std=std, gamma=float(np.mean([0.003, 0.003, 0.04, 0.01])),
        exact_grad=False,
    )
    assert not np.allclose(
        np.asarray(got), np.asarray(g_scalar.guided_eps(score_fn, proc, x, t))
    )


def test_prolong_equals_adjoint_on_constant_residual():
    # both prolongation kernels reproduce constants, so the 1/s^2-gain
    # prolongation must equal the exact adjoint exactly (same block-mean
    # gain, same temporal zero-fill) on a constant residual
    A = SpatioTemporalCoarsening(s_step=4, t_step=3)
    v = jnp.full((4, 4, 4, 2), 1.7, jnp.float32)
    for method in ("spectral", "bilinear"):
        np.testing.assert_allclose(
            A.prolong(v, out_len=12, method=method), A.adjoint(v, out_len=12),
            rtol=1e-5, atol=1e-6,
        )


def test_prolong_is_band_limited_below_obs_nyquist():
    # the point of the scale-selective formulation (H2): the exact adjoint's
    # piecewise-constant scatter aliases the residual far beyond the coarse
    # grid's representable band; the spectral prolongation injects exactly
    # nothing there and the bilinear fallback an order of magnitude less
    A = SpatioTemporalCoarsening(s_step=8, t_step=1)
    rng = np.random.RandomState(2)
    v = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
    adj = np.asarray(A.adjoint(v, out_len=1))[0, :, :, 0]
    spe = np.asarray(A.prolong(v, out_len=1, method="spectral"))[0, :, :, 0]
    bil = np.asarray(A.prolong(v, out_len=1, method="bilinear"))[0, :, :, 0]

    def beyond_coarse_band(f):
        # power at |kx| or |ky| > coarse Nyquist (4 = 64/(2*8)): nothing the
        # 8x8 residual can represent lives there — pure aliasing/leakage
        F = np.fft.fft2(f)
        n = f.shape[0]
        fr = np.abs(np.fft.fftfreq(n, 1.0 / n))
        mask = (fr[:, None] > 4.0) | (fr[None, :] > 4.0)
        return float((np.abs(F)[mask] ** 2).sum()), float((np.abs(F) ** 2).sum())

    a_out, a_tot = beyond_coarse_band(adj)
    s_out, s_tot = beyond_coarse_band(spe)
    b_out, b_tot = beyond_coarse_band(bil)
    assert a_out > 0.2 * a_tot  # the adjoint really does alias
    assert s_out < 1e-6 * s_tot  # spectral: strictly band-limited
    assert b_out < 0.25 * a_out  # bilinear: tent-kernel sidelobes only


def test_prolong_guided_eps_matches_manual():
    proc = VPCosineProcess()
    A = SpatioTemporalCoarsening(s_step=2, t_step=2)
    rng = jax.random.PRNGKey(11)
    L, H, W, C = 6, 8, 8, 2
    x = jax.random.normal(rng, (L, H, W, C))
    y = jax.random.normal(jax.random.fold_in(rng, 5), (3, 4, 4, C))
    std = per_channel([0.2, 0.3], C)
    gamma = 7e-4
    t = jnp.float32(0.37)

    def score_fn(xx, tt):
        return jnp.tanh(xx) * 0.5

    g = GaussianGuidance(A=A, y=y, std=std, gamma=gamma, prolong=True)
    got = g.guided_eps(score_fn, proc, x, t)

    eps = score_fn(x, t)
    mu, sigma = proc.mu(t), proc.sigma(t)
    var = std**2 + gamma * (sigma / mu) ** 2
    err = (y - A((x - sigma * eps) / mu)) / var
    want = eps - sigma * A.prolong(err, out_len=L) / mu
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # and it must differ from the exact-adjoint guidance on the same inputs
    g_adj = GaussianGuidance(A=A, y=y, std=std, gamma=gamma, prolong=False)
    assert not np.allclose(
        np.asarray(got), np.asarray(g_adj.guided_eps(score_fn, proc, x, t))
    )


def test_prolong_exact_grad_raises():
    import pytest

    proc = VPCosineProcess()
    A = SpatioTemporalCoarsening(s_step=2, t_step=2)
    rng = jax.random.PRNGKey(12)
    x = jax.random.normal(rng, (6, 8, 8, 2))
    y = jax.random.normal(jax.random.fold_in(rng, 6), (3, 4, 4, 2))
    g = GaussianGuidance(A=A, y=y, std=0.1, gamma=1e-3, exact_grad=True,
                         prolong=True)
    with pytest.raises(ValueError, match="prolong"):
        g.guided_eps(lambda xx, tt: jnp.tanh(xx), proc, x, jnp.float32(0.5))


def _anneal_setup():
    proc = VPCosineProcess()
    A = SpatioTemporalCoarsening(s_step=2, t_step=2)
    rng = jax.random.PRNGKey(3)
    L, H, W, C = 6, 8, 8, 2
    x = jax.random.normal(rng, (L, H, W, C))
    y = jax.random.normal(jax.random.fold_in(rng, 1), (3, 4, 4, C))

    def score_fn(xx, tt):
        return jnp.tanh(xx) * 0.5

    return proc, A, x, y, score_fn


def test_anneal_weight_semantics():
    proc, A, x, y, score_fn = _anneal_setup()
    g_off = GaussianGuidance(A=A, y=y, std=0.2, gamma=7e-4)
    g_on = GaussianGuidance(A=A, y=y, std=0.2, gamma=7e-4, anneal=0.25)
    assert float(g_off.anneal_weight(jnp.float32(0.1))) == 1.0
    assert float(g_on.anneal_weight(jnp.float32(0.5))) == 1.0  # t >= t_rel
    np.testing.assert_allclose(
        float(g_on.anneal_weight(jnp.float32(0.1))), 0.4, rtol=1e-6
    )
    assert float(g_on.anneal_weight(jnp.float32(0.0))) == 0.0


def test_anneal_interpolates_between_guided_and_unconditional():
    """annealed = (1-w)*eps + w*guided_full — exact algebra of the weight."""
    proc, A, x, y, score_fn = _anneal_setup()
    g_full = GaussianGuidance(A=A, y=y, std=0.2, gamma=7e-4)
    g_ann = GaussianGuidance(A=A, y=y, std=0.2, gamma=7e-4, anneal=0.5)
    for t_val, w in ((0.7, 1.0), (0.25, 0.5), (0.0, 0.0)):
        t = jnp.float32(t_val)
        eps = score_fn(x, t)
        full = g_full.guided_eps(score_fn, proc, x, t)
        got = g_ann.guided_eps(score_fn, proc, x, t)
        want = (1.0 - w) * eps + w * full
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )
    # at t=0 the pin is fully released: guided == unconditional eps
    got0 = g_ann.guided_eps(score_fn, proc, x, jnp.float32(0.0))
    np.testing.assert_allclose(
        np.asarray(got0), np.asarray(score_fn(x, jnp.float32(0.0))), rtol=1e-6
    )


def test_anneal_exact_grad_weighted_too():
    proc, A, x, y, score_fn = _anneal_setup()
    g_full = GaussianGuidance(A=A, y=y, std=0.2, gamma=7e-4, exact_grad=True)
    g_ann = GaussianGuidance(
        A=A, y=y, std=0.2, gamma=7e-4, exact_grad=True, anneal=0.5
    )
    t = jnp.float32(0.25)  # w = 0.5
    eps = score_fn(x, t)
    full = g_full.guided_eps(score_fn, proc, x, t)
    got = g_ann.guided_eps(score_fn, proc, x, t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(0.5 * eps + 0.5 * full),
        rtol=1e-5, atol=1e-6,
    )
