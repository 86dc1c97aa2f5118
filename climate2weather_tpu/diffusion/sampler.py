"""Predictor-corrector reverse-diffusion sampler as a single ``lax.scan``.

Capability parity with the reference sampler (src/thor/pipelines.py:41-97):
DDIM-style predictor (denoise at t, re-noise at t-dt) followed by
``corrections`` Langevin corrector steps with adaptive step size
delta = tau / mean(eps^2) and update
x <- x - (delta*eps + sqrt(2*delta)*z) * sigma(t-dt), plus a NaN guard.

TPU-first redesign: the reference runs a Python loop over 256+ steps with a
tqdm bar and a host-side NaN check per step; here the whole (steps x
correctors) schedule is one jit-compiled ``lax.scan``, so XLA pipelines the
score evaluations and the trajectory never leaves HBM.  The NaN guard is a
boolean carried through the scan and checked once on the host afterwards
(raising mid-scan is impossible under jit; semantics preserved, granularity
coarser).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from climate2weather_tpu.diffusion import steprules


def sample(
    process,
    score_fn: Callable,
    noise: jnp.ndarray,
    *,
    steps: int = 64,
    corrections: int = 0,
    tau: float = 1.0,
    corrector_variance_exact: bool = False,
    rng: Optional[jax.Array] = None,
    proc_x0: Optional[Callable] = None,
    denoise_final: bool = False,
):
    """Draw one sample by reverse diffusion from ``noise``.

    ``score_fn(x, t) -> eps_pred`` operates on the full state (trajectory or
    batch).  Returns ``(x, nan_detected)`` where ``nan_detected`` is a scalar
    bool; callers should raise on it after device sync (reference raises
    mid-sampling, src/thor/pipelines.py:90-91).

    Corrector bias note: the adaptive Langevin corrector (reference
    src/thor/pipelines.py:81-88, formulas in steprules.py) is unadjusted
    Euler-Maruyama, whose stationary variance overshoots the target by
    ~1/(1 - tau/2): +15% std at the reference's tau=0.5 (measured +12% on
    the analytic N(0,I) case), i.e. each corrector step injects broadband
    noise.  This is why the reference's tuned production configs ship
    ``num_corrections: 0``; use tau <= ~0.1 if enabling corrections.
    ``corrector_variance_exact`` (off for reference parity) rescales the
    corrector noise to the amplitude whose Gaussian stationary variance is
    exact (steprules.langevin_noise_scale), keeping the corrector's mixing
    without its broadband noise injection.

    ``denoise_final`` adds one extra score evaluation at t=0 and returns the
    posterior-mean estimate ``x - eta * eps`` instead of the re-noised state.
    The reference schedule ends at sigma(0) = eta = 1e-3
    (src/thor/pipelines.py:40-45), leaving a white residual of std eta in
    every sample; on variables whose true spectrum falls below that floor
    (e.g. mean-sea-level pressure) the floor dominates high-wavenumber RAPSD.
    Default off for reference parity.
    """
    if corrections > 0 and rng is None:
        raise ValueError("corrections > 0 requires an rng key")
    if rng is None:
        rng = jax.random.PRNGKey(0)

    dt = 1.0 / steps
    time_steps = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)[:-1]

    def step(carry, t):
        x, key, nan_flag = carry

        # Predictor: denoise at t, re-noise at t - dt.
        eps = score_fn(x, t)
        x = steprules.ddim_step(
            x,
            eps,
            process.mu(t).astype(x.dtype),
            process.sigma(t).astype(x.dtype),
            process.mu(t - dt).astype(x.dtype),
            process.sigma(t - dt).astype(x.dtype),
            proc_x0=proc_x0,
        )

        # Langevin corrector steps (static count; unrolled).
        for _ in range(corrections):
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, x.shape, x.dtype)
            eps_c = score_fn(x, t - dt)
            delta = steprules.langevin_delta(
                tau, jnp.mean(jnp.square(eps_c).astype(jnp.float32))
            )
            x = steprules.langevin_step(
                x,
                eps_c,
                z,
                delta.astype(x.dtype),
                process.sigma(t - dt).astype(x.dtype),
                sqrt2delta=steprules.langevin_noise_scale(
                    tau, delta, corrector_variance_exact
                ).astype(x.dtype),
            )

        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
        return (x, key, nan_flag), None

    (x, _, nan_flag), _ = jax.lax.scan(
        step, (noise, rng, jnp.asarray(False)), time_steps
    )
    if denoise_final:
        eps = score_fn(x, jnp.asarray(0.0, jnp.float32))
        x = process.denoise(x, 0.0, eps)
        if proc_x0 is not None:  # long/host final denoise applies it too
            x = proc_x0(x)
        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
    return x, nan_flag


def sample_and_check(process, score_fn, noise, **kwargs):
    """Like :func:`sample` but raises ``FloatingPointError`` on NaN."""
    x, nan_flag = sample(process, score_fn, noise, **kwargs)
    if bool(jax.device_get(nan_flag)):
        raise FloatingPointError("NaN detected in sample")
    return x


def logsnr_time_grid(process, steps: int, grid_points: int = 20001) -> jnp.ndarray:
    """Times t_0=1..t_steps=0 uniformly spaced in half-log-SNR
    lambda(t) = log(mu/sigma) — the standard spacing for DPM-Solver, worth
    roughly a 4x step reduction over uniform-time spacing on this cosine
    schedule (measured on the exact-Gaussian-score harness)."""
    import math

    import numpy as np

    # pure-numpy schedule math so this stays a trace-time constant under jit
    tg = np.linspace(0.0, 1.0, grid_points)
    eta = process.eta
    alpha = np.cos(math.acos(math.sqrt(eta)) * tg) ** 2
    sigma = np.sqrt(1.0 - alpha**2 + eta**2)
    lam = np.log(alpha) - np.log(sigma)
    lgrid = np.linspace(lam[-1], lam[0], steps + 1)  # lambda(1) .. lambda(0)
    t = np.interp(lgrid, lam[::-1], tg[::-1])
    t[0], t[-1] = 1.0, 0.0
    return jnp.asarray(t, jnp.float32)


def sample_dpmpp2m(
    process,
    score_fn: Callable,
    noise: jnp.ndarray,
    *,
    steps: int = 64,
    rng: Optional[jax.Array] = None,  # used only when sde_eta > 0
    proc_x0: Optional[Callable] = None,
    lambda_spacing: bool = True,
    denoise_final: bool = False,
    sde_eta: float = 0.0,
):
    """DPM-Solver++(2M) multistep sampler (Lu et al., 2022) — second-order
    in data-prediction space.  Reaches the quality of many more first-order
    (DDIM/PC-predictor) steps with the same eps model and the same
    guidance, cutting the per-sample network-evaluation count — the
    dominant cost of year-scale downscaling (SURVEY.md §3.2 cost model).

    Half-log-SNR lambda(t) = log(mu/sigma); with h_i = lambda_i -
    lambda_{i-1} and r = h_{i-1}/h_i the update in data space is

        D_i = (1 + 1/(2 r)) x0_i - (1/(2 r)) x0_{i-1}
        x   = (sigma_i / sigma_{i-1}) x - mu_i (exp(-h_i) - 1) D_i

    (first step: D = x0, the DDIM step).  Steps are spaced uniformly in
    lambda by default (``lambda_spacing``), uniformly in t otherwise.

    ``sde_eta > 0`` selects SDE-DPM-Solver++(2M) (midpoint form,
    steprules.dpm_sde_scalar_coeffs): per-step noise injection of strength
    eta against a matched extra decay of the carried state — re-randomizes
    solver error instead of accumulating it, at zero extra network evals;
    eta = 0 is exactly the deterministic solver.  Requires ``rng``.
    Returns ``(x, nan_detected)``.
    """
    if sde_eta < 0:
        raise ValueError(f"sde_eta must be >= 0, got {sde_eta}")
    if sde_eta > 0 and rng is None:
        # no silent PRNGKey(0) fallback: every "independent" ensemble member
        # would inject identical noise (same rationale as the PC corrector)
        raise ValueError("sde_eta > 0 requires an rng key")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if lambda_spacing:
        time_steps = logsnr_time_grid(process, steps)
    else:
        time_steps = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)

    def step(carry, ts):
        x, prev_x0, prev_h, is_first, key, nan_flag = carry
        t_prev, t_cur = ts
        eps = score_fn(x, t_prev)
        x0 = process.denoise(x, t_prev, eps)
        if proc_x0 is not None:
            x0 = proc_x0(x0)

        if sde_eta > 0:
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, x.shape, x.dtype)
            h, decay, growth, corr, nscale = steprules.dpm_sde_scalar_coeffs(
                process, t_prev, t_cur, prev_h, sde_eta
            )
            x = steprules.dpm_sde_step(
                x, x0, prev_x0, z,
                decay.astype(x.dtype), growth.astype(x.dtype),
                corr.astype(x.dtype), nscale.astype(x.dtype), ~is_first,
            )
        else:
            h, sigma_ratio, growth, c_cur, c_prev = steprules.dpm_scalar_coeffs(
                process, t_prev, t_cur, prev_h
            )
            d = steprules.dpm_data_estimate(
                x0, prev_x0, c_cur.astype(x.dtype), c_prev.astype(x.dtype),
                ~is_first,
            )
            x = steprules.dpm_step(
                x, d, sigma_ratio.astype(x.dtype), growth.astype(x.dtype)
            )

        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
        return (x, x0, h, jnp.asarray(False), key, nan_flag), None

    init = (
        noise,
        jnp.zeros_like(noise),
        jnp.ones((), jnp.float32),
        jnp.asarray(True),
        rng,
        jnp.asarray(False),
    )
    (x, _, _, _, _, nan_flag), _ = jax.lax.scan(
        step, init, (time_steps[:-1], time_steps[1:])
    )
    if denoise_final:
        eps = score_fn(x, jnp.asarray(0.0, jnp.float32))
        x = process.denoise(x, 0.0, eps)
        if proc_x0 is not None:  # long/host final denoise applies it too
            x = proc_x0(x)
        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
    return x, nan_flag


def sample_dpmpp3m(
    process,
    score_fn: Callable,
    noise: jnp.ndarray,
    *,
    steps: int = 32,
    rng: Optional[jax.Array] = None,  # unused; signature-compatible
    proc_x0: Optional[Callable] = None,
    lambda_spacing: bool = True,
    denoise_final: bool = False,
):
    """DPM-Solver++(3M): third-order multistep in data-prediction space.

    Same family and step spacing as :func:`sample_dpmpp2m`, with a quadratic
    extrapolant over the last three x0 predictions (exact-integrator
    A0/A1/A2 weights, ``steprules.dpm3_scalar_coeffs``).  Warm-up: step 0 is
    first-order (D = x0), step 1 second-order (the 2M combination), then
    third-order.  On TPU the sequential step count is the one latency axis
    the compiler cannot parallelize, so matching quality at fewer steps is
    the remaining sampling-latency lever.  Returns ``(x, nan_detected)``.
    """
    del rng
    if lambda_spacing:
        time_steps = logsnr_time_grid(process, steps)
    else:
        time_steps = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)

    def step(carry, ts):
        x, prev_x0, prev2_x0, prev_h, prev2_h, i, nan_flag = carry
        t_prev, t_cur = ts
        eps = score_fn(x, t_prev)
        x0 = process.denoise(x, t_prev, eps)
        if proc_x0 is not None:
            x0 = proc_x0(x0)

        h, sigma_ratio, growth, c_cur, c_prev = steprules.dpm_scalar_coeffs(
            process, t_prev, t_cur, prev_h
        )
        d2 = steprules.dpm_data_estimate(
            x0, prev_x0, c_cur.astype(x.dtype), c_prev.astype(x.dtype), i >= 1
        )
        _, _, _, w0, w1, w2 = steprules.dpm3_scalar_coeffs(
            process, t_prev, t_cur, prev_h, prev2_h
        )
        d3 = steprules.dpm3_data_estimate(
            x0, prev_x0, prev2_x0,
            w0.astype(x.dtype), w1.astype(x.dtype), w2.astype(x.dtype),
        )
        d = jnp.where(i >= 2, d3, d2)
        x = steprules.dpm_step(
            x, d, sigma_ratio.astype(x.dtype), growth.astype(x.dtype)
        )

        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
        return (x, x0, prev_x0, h, prev_h, i + 1, nan_flag), None

    init = (
        noise,
        jnp.zeros_like(noise),
        jnp.zeros_like(noise),
        jnp.ones((), jnp.float32),
        jnp.ones((), jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.asarray(False),
    )
    (x, _, _, _, _, _, nan_flag), _ = jax.lax.scan(
        step, init, (time_steps[:-1], time_steps[1:])
    )
    if denoise_final:
        eps = score_fn(x, jnp.asarray(0.0, jnp.float32))
        x = process.denoise(x, 0.0, eps)
        if proc_x0 is not None:
            x = proc_x0(x)
        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
    return x, nan_flag


SAMPLERS = {"pc": sample, "dpmpp2m": sample_dpmpp2m, "dpmpp3m": sample_dpmpp3m}
