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


def sample(
    process,
    score_fn: Callable,
    noise: jnp.ndarray,
    *,
    steps: int = 64,
    corrections: int = 0,
    tau: float = 1.0,
    rng: Optional[jax.Array] = None,
    proc_x0: Optional[Callable] = None,
):
    """Draw one sample by reverse diffusion from ``noise``.

    ``score_fn(x, t) -> eps_pred`` operates on the full state (trajectory or
    batch).  Returns ``(x, nan_detected)`` where ``nan_detected`` is a scalar
    bool; callers should raise on it after device sync (reference raises
    mid-sampling, src/thor/pipelines.py:90-91).
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
        x0 = process.denoise(x, t, eps)
        if proc_x0 is not None:
            x0 = proc_x0(x0)
        x = process.renoise(x0, t - dt, eps)

        # Langevin corrector steps (static count; unrolled).
        for _ in range(corrections):
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, x.shape, x.dtype)
            eps_c = score_fn(x, t - dt)
            delta = tau / jnp.mean(jnp.square(eps_c).astype(jnp.float32))
            x = x - (
                delta.astype(x.dtype) * eps_c
                + jnp.sqrt(2.0 * delta).astype(x.dtype) * z
            ) * process.sigma(t - dt).astype(x.dtype)

        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
        return (x, key, nan_flag), None

    (x, _, nan_flag), _ = jax.lax.scan(
        step, (noise, rng, jnp.asarray(False)), time_steps
    )
    return x, nan_flag


def sample_and_check(process, score_fn, noise, **kwargs):
    """Like :func:`sample` but raises ``FloatingPointError`` on NaN."""
    x, nan_flag = sample(process, score_fn, noise, **kwargs)
    if bool(jax.device_get(nan_flag)):
        raise FloatingPointError("NaN detected in sample")
    return x
