"""Single source of truth for reverse-diffusion update formulas.

Three sampler layouts consume these rules (VERDICT r1 weak-item 7):

- ``diffusion/sampler.py``  — on-device NHWC ``lax.scan`` (short trajectories)
- ``diffusion/long_sampler.py`` — NCHW frame-chunked, memory-bounded
- ``diffusion/host_stream.py``  — numpy over a host-resident trajectory

The functions are backend-agnostic: they use only arithmetic operators on
the array argument and expect every schedule coefficient to be pre-cast to
the array's compute dtype by the caller (jnp fp32 scalars ``.astype`` for
device paths, python floats for the numpy path).  Keeping the coefficients
out of the formulas is what lets one implementation serve jnp-NHWC,
jnp-NCHW, and numpy without accidental host->device promotion.

Formula provenance (parity citations):

- DDIM predictor: denoise at t, re-noise at t-dt
  (reference src/thor/pipelines.py:41-46)
- Langevin corrector: delta = tau / mean(eps^2),
  x <- x - (delta*eps + sqrt(2 delta) z) * sigma(t-dt)
  (reference src/thor/pipelines.py:81-88); opt-in variance-exact noise
  amplitude sqrt((2 - tau) delta) (:func:`langevin_noise_scale`) removes
  the unadjusted chain's stationary-variance overshoot
- DPM-Solver++(2M): Lu et al. 2022, data-prediction multistep
  (no reference analog; quality/cost extension)
- DPM-Solver++(3M): same family, third-order multistep — exact-integrator
  A0/A1/A2 weights over a quadratic data extrapolant
- SDE-DPM-Solver++(2M): the stochastic variant (Lu et al. 2022b; midpoint
  multistep form) — per-step noise injection of strength eta with the
  matching exponential decay, reducing exactly to 2M at eta = 0
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "predict_x0",
    "ddim_renoise",
    "ddim_step",
    "ddim_step_inplace",
    "langevin_delta",
    "langevin_noise_scale",
    "langevin_step",
    "langevin_step_inplace",
    "dpm_scalar_coeffs",
    "dpm_data_estimate",
    "dpm_step",
    "dpm3_scalar_coeffs",
    "dpm3_data_estimate",
    "dpm_sde_scalar_coeffs",
    "dpm_sde_step",
]


# -- first-order predictor (DDIM-style) -------------------------------------

def predict_x0(x, eps, mu, sigma):
    """x_hat0 = (x_t - sigma eps) / mu."""
    return (x - sigma * eps) / mu


def ddim_renoise(x0, eps, mu2, sigma2):
    """Re-noise a denoised estimate at the next time: mu2 x0 + sigma2 eps."""
    return mu2 * x0 + sigma2 * eps


def ddim_step(x, eps, mu, sigma, mu2, sigma2, proc_x0=None):
    """One predictor step; ``proc_x0`` (optional) post-processes the
    denoised estimate before re-noising (reference pipelines.py:41-46)."""
    x0 = predict_x0(x, eps, mu, sigma)
    if proc_x0 is not None:
        x0 = proc_x0(x0)
    return ddim_renoise(x0, eps, mu2, sigma2)


def ddim_step_inplace(x, eps, mu, sigma, mu2, sigma2, proc_x0=None):
    """Zero-allocation numpy twin of :func:`ddim_step` for host-resident
    trajectories (diffusion/host_stream.py), where a multi-GB temporary per
    step can OOM the host.  Mutates and CONSUMES both ``x`` and ``eps``
    (``eps`` is garbage afterwards); returns ``x``.

    Algebra (identical to ddim_step):
        x  <- x - sigma*eps          # = mu * x0
        x  <- x * mu2/mu             # = mu2 * x0   (proc_x0 applied on x0)
        x  <- x + sigma2*eps
    """
    eps *= sigma
    x -= eps  # x = mu * x0
    if proc_x0 is not None:
        x /= mu
        x0 = proc_x0(x)
        if x0 is not x:
            x[...] = x0
        x *= mu2
    else:
        x *= mu2 / mu
    eps *= sigma2 / sigma
    x += eps
    return x


# -- Langevin corrector ------------------------------------------------------

def langevin_delta(tau, mean_sq_eps):
    """Adaptive corrector step size delta = tau / mean(eps^2)."""
    return tau / mean_sq_eps


def langevin_noise_scale(tau, delta, variance_exact=False):
    """Noise amplitude of one corrector step (the ``sqrt(2 delta)`` factor).

    Unadjusted Euler-Maruyama (reference parity, src/thor/pipelines.py:81-88)
    injects noise of variance ``2 delta sigma^2`` per step; under the
    adaptive rule ``delta = tau / mean(eps^2)`` the chain's stationary
    variance on a Gaussian marginal of any variance v overshoots the target
    by 1/(1 - tau/2) (+15% std at tau=0.5 — measured,
    docs/fidelity/FIDELITY.md): the effective x-space drift contracts by
    (1 - tau) per step, for which ``2 delta`` is too much noise.

    ``variance_exact=True`` scales the noise to ``sqrt((2 - tau) delta)``:
    with the same drift, the Gaussian stationary variance is then exactly v
    — the adaptive normalization makes the correction a function of tau
    alone, independent of the (unknown) marginal variance.  This removes
    the corrector's broadband noise injection while keeping its mixing;
    requires ``tau < 2``.
    """
    if variance_exact:
        if not 0.0 < tau < 2.0:
            raise ValueError(f"variance-exact corrector requires 0 < tau < 2, got {tau}")
        return ((2.0 - tau) * delta) ** 0.5
    return (2.0 * delta) ** 0.5


def langevin_step(x, eps, z, delta, sigma2, sqrt2delta=None):
    """x <- x - (delta eps + sqrt(2 delta) z) * sigma2.

    ``sqrt2delta`` may be passed pre-cast when ``delta`` is a traced scalar
    of a different dtype than ``x``; computed from ``delta`` otherwise."""
    if sqrt2delta is None:
        sqrt2delta = (2.0 * delta) ** 0.5
    return x - (delta * eps + sqrt2delta * z) * sigma2


def langevin_step_inplace(x, eps, z, delta, sigma2, noise_scale=None):
    """Zero-allocation numpy twin of :func:`langevin_step`.  Mutates and
    CONSUMES ``eps`` and ``z``; returns ``x`` updated in place.

        x <- x - (delta*eps + noise_scale z) * sigma2

    ``noise_scale`` defaults to ``sqrt(2 delta)`` (see
    :func:`langevin_noise_scale` for the variance-exact alternative).
    """
    if noise_scale is None:
        noise_scale = (2.0 * delta) ** 0.5
    eps *= delta * sigma2
    z *= noise_scale * sigma2
    x -= eps
    x -= z
    return x


# -- DPM-Solver++(2M) --------------------------------------------------------

def dpm_scalar_coeffs(process, t_prev, t_cur, prev_h):
    """fp32 scalar coefficients of one DPM++(2M) update.

    Returns ``(h, sigma_ratio, growth, c_cur, c_prev)`` as jnp fp32 scalars
    (host paths ``float()`` them):

        h           = lambda(t_cur) - lambda(t_prev)
        sigma_ratio = sigma(t_cur) / sigma(t_prev)
        growth      = -expm1(-h) * mu(t_cur)
        c_cur       = 1 + 1/(2 r),  c_prev = 1/(2 r),  r = prev_h / h
    """
    lam_prev = jnp.log(process.mu(t_prev)) - jnp.log(process.sigma(t_prev))
    lam_cur = jnp.log(process.mu(t_cur)) - jnp.log(process.sigma(t_cur))
    h = lam_cur - lam_prev
    r = prev_h / h
    sigma_ratio = process.sigma(t_cur) / process.sigma(t_prev)
    growth = -(jnp.expm1(-h)) * process.mu(t_cur)
    c_cur = 1.0 + 1.0 / (2.0 * r)
    c_prev = 1.0 / (2.0 * r)
    return h, sigma_ratio, growth, c_cur, c_prev


def dpm_data_estimate(x0, prev_x0, c_cur, c_prev, use_multi):
    """D_i: the (extrapolated) data estimate. ``use_multi`` selects the
    second-order combination over the first-step fallback D = x0; it may be
    a traced bool (jnp.where semantics) or a python bool."""
    d_multi = c_cur * x0 - c_prev * prev_x0
    if isinstance(use_multi, bool):
        return d_multi if use_multi else x0
    return jnp.where(use_multi, d_multi, x0)


def dpm_step(x, d, sigma_ratio, growth):
    """x <- sigma_ratio * x + growth * D."""
    return sigma_ratio * x + growth * d


# -- DPM-Solver++(3M) --------------------------------------------------------

def dpm3_scalar_coeffs(process, t_prev, t_cur, prev_h, prev2_h):
    """fp32 scalar coefficients of one DPM++(3M) update.

    Third-order multistep in data-prediction space (Lu et al. 2022, the
    standard third-order extension).  With lambda = log(mu/sigma),
    h = lambda(t_cur) - lambda(t_prev), and the two previous lambda-step
    sizes ``prev_h`` (h_0) and ``prev2_h`` (h_1), the exact-integrator
    weights of the quadratic data extrapolant are, in terms of
    r0 = h_0/h, r1 = h_1/h:

        A0 = -expm1(-h)                 (first-order weight)
        A1 = 1 + expm1(-h)/h            (weight of the first difference D1)
        A2 = 1/2 - (expm1(-h) + h)/h^2  (weight of the second difference D2)

        D1 = D1_0 + r0/(r0+r1) (D1_0 - D1_1),  D2 = (D1_0 - D1_1)/(r0+r1)
        D1_0 = (x0 - prev_x0)/r0,  D1_1 = (prev_x0 - prev2_x0)/r1

    Folding D0/D1/D2 into one effective data estimate keeps the update in
    the same ``dpm_step`` form as 2M: x <- sigma_ratio x + growth D with
    growth = mu(t_cur) A0 and D = w0 x0 + w1 prev_x0 + w2 prev2_x0.

    Returns ``(h, sigma_ratio, growth, w0, w1, w2)`` as jnp fp32 scalars.
    """
    lam_prev = jnp.log(process.mu(t_prev)) - jnp.log(process.sigma(t_prev))
    lam_cur = jnp.log(process.mu(t_cur)) - jnp.log(process.sigma(t_cur))
    h = lam_cur - lam_prev
    r0 = prev_h / h
    r1 = prev2_h / h
    em = jnp.expm1(-h)
    a0 = -em
    a1 = 1.0 + em / h
    a2 = 0.5 - (em + h) / (h * h)
    s = r0 + r1
    ca = 1.0 + r0 / s  # D1 = ca*D1_0 - cb*D1_1;  D2 = cc*(D1_0 - D1_1)
    cb = r0 / s
    cc = 1.0 / s
    u_cur = (a1 * ca + a2 * cc) / r0
    u_old = (a1 * cb + a2 * cc) / r1
    w0 = 1.0 + u_cur / a0
    w1 = -(u_cur + u_old) / a0
    w2 = u_old / a0
    sigma_ratio = process.sigma(t_cur) / process.sigma(t_prev)
    growth = a0 * process.mu(t_cur)
    return h, sigma_ratio, growth, w0, w1, w2


def dpm3_data_estimate(x0, prev_x0, prev2_x0, w0, w1, w2):
    """Effective third-order data estimate D = w0 x0 + w1 prev + w2 prev2."""
    return w0 * x0 + w1 * prev_x0 + w2 * prev2_x0


# -- SDE-DPM-Solver++(2M) ----------------------------------------------------

def dpm_sde_scalar_coeffs(process, t_prev, t_cur, prev_h, eta):
    """fp32 scalar coefficients of one SDE-DPM-Solver++(2M) update.

    The stochastic second-order multistep solver (Lu et al. 2022b, in the
    midpoint multistep form): with lambda = log(mu/sigma),
    h = lambda(t_cur) - lambda(t_prev) > 0 and noise strength eta >= 0,

        decay  = (sigma(t_cur)/sigma(t_prev)) exp(-eta h)
        growth = mu(t_cur) (1 - exp(-(1 + eta) h))
        corr   = growth (h / prev_h) / 2         (midpoint multistep term)
        nscale = sigma(t_cur) sqrt(1 - exp(-2 eta h))

        x <- decay x + growth x0 + corr (x0 - prev_x0) + nscale z

    At eta = 0 this is EXACTLY DPM-Solver++(2M): decay = sigma ratio,
    growth = -mu expm1(-h), and corr (x0 - prev_x0) equals the 2M
    extrapolant correction growth/(2r) (x0 - prev_x0).  Each step's noise
    injection is exchanged against a matched extra contraction of the
    carried state, so the marginal law is preserved while trajectory-level
    solver error is re-randomized instead of accumulated — the sampler-side
    ensemble-dispersion lever that costs zero extra network evaluations
    (unlike Langevin correctors, one more eval each).

    Returns ``(h, decay, growth, corr, nscale)`` as jnp fp32 scalars.
    """
    lam_prev = jnp.log(process.mu(t_prev)) - jnp.log(process.sigma(t_prev))
    lam_cur = jnp.log(process.mu(t_cur)) - jnp.log(process.sigma(t_cur))
    h = lam_cur - lam_prev
    decay = (process.sigma(t_cur) / process.sigma(t_prev)) * jnp.exp(-eta * h)
    growth = -(jnp.expm1(-(1.0 + eta) * h)) * process.mu(t_cur)
    corr = 0.5 * growth * (h / prev_h)
    nscale = process.sigma(t_cur) * jnp.sqrt(-jnp.expm1(-2.0 * eta * h))
    return h, decay, growth, corr, nscale


def dpm_sde_step(x, x0, prev_x0, z, decay, growth, corr, nscale, use_multi):
    """One SDE-DPM++(2M) update; ``use_multi`` gates the multistep term
    (False on the first step, where prev_x0 is undefined)."""
    x = decay * x + growth * x0 + nscale * z
    d = corr * (x0 - prev_x0)
    if isinstance(use_multi, bool):
        return x + d if use_multi else x
    return x + jnp.where(use_multi, d, jnp.zeros_like(d))
