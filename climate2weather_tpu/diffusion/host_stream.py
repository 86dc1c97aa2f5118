"""Host-streaming sampling for trajectories that exceed device HBM.

Capability parity with the reference ``BatchedScoreFunction``
(src/thor/score.py:96-185), whose purpose is sampling sequences too large
for accelerator memory: the trajectory lives in host RAM and only window
chunks visit the device.

When the trajectory fits HBM (a full year of 4-var 128x128 hourly fields is
~2.3 GB — it fits easily), use the on-device scan sampler
(diffusion/sampler.py); this module is the fallback for decade-scale or
high-resolution trajectories.

TPU-idiomatic differences from the reference:

- windows are gathered on host as zero-copy strided views
  (``sliding_window_view``), not materialized tensors;
- the per-chunk device evaluation is one jitted function reused across
  chunks/steps (no per-chunk graph rebuilds);
- the guidance gradient uses the analytic coarse-graining adjoint in numpy
  (detached mode — the production path), so no autodiff graph ever spans
  the host trajectory;
- predictor/corrector updates are vectorized numpy over the host buffer.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class NumpyCoarsening:
    """numpy twin of guidance.SpatioTemporalCoarsening (same math)."""

    def __init__(self, s_step: int = 16, t_step: int = 6):
        self.s_step = s_step
        self.t_step = t_step

    def __call__(self, x: np.ndarray) -> np.ndarray:
        x = x[:: self.t_step]
        lo, H, W, C = x.shape
        s = self.s_step
        return x.reshape(lo, H // s, s, W // s, s, C).mean(axis=(2, 4))

    def adjoint(self, v: np.ndarray, out_len: int) -> np.ndarray:
        lo, h, w, C = v.shape
        s = self.s_step
        u = np.broadcast_to(
            v[:, :, None, :, None, :] / (s * s), (lo, h, s, w, s, C)
        ).reshape(lo, h * s, w * s, C)
        out = np.zeros((out_len, h * s, w * s, C), v.dtype)
        out[:: self.t_step] = u[: -(-out_len // self.t_step)]
        return out


class HostStreamingScoreFn:
    """eps prediction over a host-resident [L, H, W, C] numpy trajectory."""

    def __init__(
        self,
        apply_fn: Callable,
        params,
        markov_order: int,
        batch_size: int = 128,
    ):
        self.params = params
        self.markov_order = int(markov_order)
        self.batch_size = int(batch_size)

        @jax.jit
        def _eval(params, windows, t):
            return apply_fn(params, windows, jnp.reshape(jnp.asarray(t), (-1,)))

        self._eval = _eval

    @property
    def window(self) -> int:
        return 2 * self.markov_order + 1

    def __call__(self, x: np.ndarray, t: float) -> np.ndarray:
        k, w, B = self.markov_order, self.window, self.batch_size
        L, H, W, C = x.shape
        n = L - w + 1
        # [n, w, H, W, C] zero-copy strided view
        wins = np.lib.stride_tricks.sliding_window_view(x, w, axis=0)
        # sliding_window_view puts the window axis last: [n, H, W, C, w]
        out = np.empty((L, H, W, C), np.float32)
        centers = out[k : k + n]
        for c0 in range(0, n, B):
            c1 = min(c0 + B, n)
            chunk = wins[c0:c1]  # [b, H, W, C, w] view
            chunk = np.moveaxis(chunk, -1, 3).reshape(c1 - c0, H, W, w * C)
            eps = np.asarray(
                jax.device_get(self._eval(self.params, jnp.asarray(chunk), t)),
                np.float32,
            ).reshape(c1 - c0, H, W, w, C)
            centers[c0:c1] = eps[:, :, :, k, :]
            if c0 == 0 and k > 0:
                out[:k] = np.moveaxis(eps[0, :, :, :k, :], 2, 0)
            if c1 == n and k > 0:
                out[k + n :] = np.moveaxis(eps[-1, :, :, w - k :, :], 2, 0)
        return out


def sample_host(
    process,
    score_fn: HostStreamingScoreFn,
    noise: np.ndarray,
    *,
    steps: int = 64,
    corrections: int = 0,
    tau: float = 1.0,
    corrector_variance_exact: bool = False,
    guidance_A: Optional[NumpyCoarsening] = None,
    guidance_y: Optional[np.ndarray] = None,
    guidance_std=1e-2,
    guidance_gamma=1e-2,
    seed: int = 0,
    verbose: bool = False,
    proc_x0=None,
    denoise_final: bool = False,
) -> np.ndarray:
    """Predictor-corrector sampling over a host-resident trajectory.

    Update formulas are shared with the device samplers
    (diffusion/steprules.py; reference src/thor/pipelines.py:41-97) with
    python-float coefficients so everything stays numpy on the host;
    guidance is the detached analytic form.  ``proc_x0`` post-processes the
    denoised estimate (full [L, H, W, C] numpy trajectory) each predictor
    step.  Raises on NaN like the reference.
    """
    from climate2weather_tpu.diffusion import steprules

    x = np.asarray(noise, np.float32).copy()
    L = x.shape[0]
    if guidance_A is not None:
        expected_lo = -(-L // guidance_A.t_step)
        if guidance_y.shape[0] != expected_lo:
            raise ValueError(
                f"observation has {guidance_y.shape[0]} time rows; the "
                f"{L}-frame trajectory with t_step={guidance_A.t_step} "
                f"requires exactly {expected_lo}"
            )
    rng = np.random.RandomState(seed)
    time_steps = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
    dt = 1.0 / steps
    std = np.asarray(guidance_std, np.float32)
    gamma = np.asarray(guidance_gamma, np.float32)

    def schedule(t):
        mu = float(process.mu(t))
        sigma = float(process.sigma(t))
        return mu, sigma

    def guided_eps(x, t):
        eps = score_fn(x, float(t))
        if guidance_A is None:
            return eps
        mu, sigma = schedule(t)
        # A is linear, so A(x0) = (A(x) - sigma A(eps)) / mu — never
        # materialize the full-trajectory x0 (same identity as the device
        # path's _obs_err_nchw); the only trajectory-sized temporary is the
        # adjoint output, consumed in place.
        a_x0 = (guidance_A(x) - sigma * guidance_A(eps)) / mu
        err = (guidance_y - a_x0) / (std**2 + gamma * (sigma / mu) ** 2)
        adj = guidance_A.adjoint(err.astype(np.float32), L)
        adj *= sigma / mu
        eps -= adj
        return eps

    for i, t in enumerate(time_steps[:-1]):
        mu, sigma = schedule(t)
        mu2, sigma2 = schedule(t - dt)
        # in-place update rules: this module exists precisely for
        # trajectories near host-memory limits, so peak stays at x + eps
        # unguided (+ one adjoint-sized buffer inside guided_eps); the
        # allocating steprules would transiently hold ~4 copies
        eps = guided_eps(x, t)
        x = steprules.ddim_step_inplace(
            x, eps, mu, sigma, mu2, sigma2, proc_x0=proc_x0
        )
        for _ in range(corrections):
            eps = guided_eps(x, t - dt)
            delta = steprules.langevin_delta(
                tau, float(np.mean(np.square(eps), dtype=np.float64))
            )
            z = rng.standard_normal(x.shape).astype(np.float32)
            x = steprules.langevin_step_inplace(
                x, eps, z, delta, sigma2,
                noise_scale=steprules.langevin_noise_scale(
                    tau, delta, corrector_variance_exact
                ),
            )
        if not np.isfinite(x).all():
            raise FloatingPointError(f"NaN detected in sample at step {i}")
        if verbose and (i % 16 == 0 or i == steps - 1):
            print(f"host-stream sampling: step {i + 1}/{steps}")
    if denoise_final:
        # one extra guided score pass at t=0; return the posterior-mean
        # estimate, removing the sigma(0)=eta residual floor (see
        # sampler.sample). In-place: x -= sigma0 * eps then /= mu0.
        mu0, sigma0 = schedule(0.0)
        eps = guided_eps(x, 0.0)
        eps *= sigma0
        x -= eps
        x /= mu0
        if proc_x0 is not None:
            x = proc_x0(x)
        if not np.isfinite(x).all():
            raise FloatingPointError("NaN detected in final denoise")
    return x


def sample_host_dpm(
    process,
    score_fn: HostStreamingScoreFn,
    noise: np.ndarray,
    *,
    steps: int = 64,
    sde_eta: float = 0.0,
    guidance_A: Optional[NumpyCoarsening] = None,
    guidance_y: Optional[np.ndarray] = None,
    guidance_std=1e-2,
    guidance_gamma=1e-2,
    seed: int = 0,
    verbose: bool = False,
    proc_x0=None,
    denoise_final: bool = False,
    frame_slab: int = 256,
) -> np.ndarray:
    """DPM-Solver++(2M) over a host-resident trajectory (log-SNR spacing),
    with the optional SDE form (``sde_eta > 0``; see
    sampler.sample_dpmpp2m).  Gives beyond-HBM trajectories the same
    ~4x step-count reduction as the device tiers (64 DPM++ steps vs 256 PC
    steps at comparable quality).

    Memory: one more trajectory-sized buffer than :func:`sample_host` (the
    previous x0 prediction), peak ~3 trajectory buffers plus the guidance
    adjoint temporary.  All update arithmetic runs over ``frame_slab``-sized
    slabs so numpy never materializes a trajectory-sized expression
    temporary; SDE noise is drawn per slab for the same reason.
    """
    from climate2weather_tpu.diffusion import steprules
    from climate2weather_tpu.diffusion.sampler import logsnr_time_grid

    if sde_eta < 0:
        raise ValueError(f"sde_eta must be >= 0, got {sde_eta}")
    x = np.asarray(noise, np.float32).copy()
    L = x.shape[0]
    if guidance_A is not None:
        expected_lo = -(-L // guidance_A.t_step)
        if guidance_y.shape[0] != expected_lo:
            raise ValueError(
                f"observation has {guidance_y.shape[0]} time rows; the "
                f"{L}-frame trajectory with t_step={guidance_A.t_step} "
                f"requires exactly {expected_lo}"
            )
    rng = np.random.RandomState(seed)
    time_steps = np.asarray(logsnr_time_grid(process, steps), np.float64)
    std = np.asarray(guidance_std, np.float32)
    gamma = np.asarray(guidance_gamma, np.float32)

    def guided_eps(x, t):
        eps = score_fn(x, float(t))
        if guidance_A is None:
            return eps
        mu = float(process.mu(t))
        sigma = float(process.sigma(t))
        # A is linear: A(x0) = (A(x) - sigma A(eps)) / mu (see sample_host)
        a_x0 = (guidance_A(x) - sigma * guidance_A(eps)) / mu
        err = (guidance_y - a_x0) / (std**2 + gamma * (sigma / mu) ** 2)
        adj = guidance_A.adjoint(err.astype(np.float32), L)
        adj *= sigma / mu
        eps -= adj
        return eps

    slabs = [slice(s, min(s + frame_slab, L)) for s in range(0, L, frame_slab)]
    prev_x0: Optional[np.ndarray] = None
    prev_h = 1.0
    for i, (t_prev, t_cur) in enumerate(zip(time_steps[:-1], time_steps[1:])):
        mu = float(process.mu(t_prev))
        sigma = float(process.sigma(t_prev))
        x0 = guided_eps(x, t_prev)  # consumed: becomes the x0 buffer
        for sl in slabs:  # x0 = (x - sigma eps)/mu, slab-wise in place
            np.multiply(x0[sl], -sigma / mu, out=x0[sl])
            x0[sl] += x[sl] / mu
        if proc_x0 is not None:
            p = proc_x0(x0)
            if p is not x0:
                x0[...] = p
        if sde_eta > 0:
            h, decay, growth, corr, nscale = (
                float(v)
                for v in steprules.dpm_sde_scalar_coeffs(
                    process, t_prev, t_cur, prev_h, sde_eta
                )
            )
            for sl in slabs:
                x[sl] *= decay
                if prev_x0 is None:
                    x[sl] += growth * x0[sl]
                else:
                    x[sl] += (growth + corr) * x0[sl]
                    x[sl] -= corr * prev_x0[sl]
                x[sl] += (nscale * rng.standard_normal(x[sl].shape)).astype(
                    np.float32
                )
        else:
            h, sigma_ratio, growth, c_cur, c_prev = (
                float(v)
                for v in steprules.dpm_scalar_coeffs(
                    process, t_prev, t_cur, prev_h
                )
            )
            for sl in slabs:
                x[sl] *= sigma_ratio
                if prev_x0 is None:  # first step: D = x0
                    x[sl] += growth * x0[sl]
                else:
                    x[sl] += (growth * c_cur) * x0[sl]
                    x[sl] -= (growth * c_prev) * prev_x0[sl]
        prev_x0 = x0  # the old prev_x0 buffer is garbage-collected
        prev_h = h
        if not np.isfinite(x).all():
            raise FloatingPointError(f"NaN detected in sample at step {i}")
        if verbose and (i % 16 == 0 or i == steps - 1):
            print(f"host-stream dpm sampling: step {i + 1}/{steps}")
    if denoise_final:
        mu0 = float(process.mu(0.0))
        sigma0 = float(process.sigma(0.0))
        eps = guided_eps(x, 0.0)
        eps *= sigma0
        x -= eps
        x /= mu0
        if proc_x0 is not None:
            x = proc_x0(x)
        if not np.isfinite(x).all():
            raise FloatingPointError("NaN detected in final denoise")
    return x
