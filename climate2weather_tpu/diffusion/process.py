"""Variance-preserving cosine noise process (forward SDE + training loss).

Parity: the reference's ``SDAPipeline`` schedule and loss
(src/thor/pipelines.py:8-35):

    alpha(t) = cos(acos(sqrt(eta)) * t)^2
    mu(t)    = alpha(t)
    sigma(t) = sqrt(1 - alpha(t)^2 + eta^2)          eta = 1e-3
    x_t      = mu(t) * x0 + sigma(t) * eps,   eps ~ N(0, I)
    loss     = (eps_pred(x_t, t) - eps)^2,    t ~ U(0,1) per sample

TPU notes: all schedule math runs in float32 regardless of the compute dtype
(sigma is ill-conditioned near t=0/1 in bf16); the process is a frozen
dataclass of static floats so it is a pytree-free jit constant.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from climate2weather_tpu.utils.registry import register


@register("vp_cosine")
@register("sda_pipeline")  # reference-compatible alias (thor.pipelines.SDAPipeline)
@dataclass(frozen=True)
class VPCosineProcess:
    """Cosine VP diffusion process with stability floor ``eta``."""

    eta: float = 1e-3

    # -- schedule ----------------------------------------------------------
    def alpha(self, t):
        t = jnp.asarray(t, jnp.float32)
        return jnp.cos(math.acos(math.sqrt(self.eta)) * t) ** 2

    def mu(self, t):
        return self.alpha(t)

    def sigma(self, t):
        a = self.alpha(t)
        return jnp.sqrt(1.0 - a**2 + self.eta**2)

    # -- forward process ---------------------------------------------------
    def perturb(self, rng, x, t):
        """Sample x_t ~ N(mu(t) x, sigma(t)^2 I). Returns (x_t, eps)."""
        eps = jax.random.normal(rng, x.shape, dtype=x.dtype)
        mu = self.mu(t).astype(x.dtype)
        sigma = self.sigma(t).astype(x.dtype)
        return mu * x + sigma * eps, eps

    def loss(self, rng, eps_model, x, forcing=None):
        """Denoising score-matching loss, mean over batch and elements.

        ``eps_model(x_t, t, forcing)`` predicts the noise.  ``x`` has shape
        [B, H, W, C]; per-sample times t ~ U(0,1) broadcast as [B,1,1,1]
        (reference: src/thor/pipelines.py:27-35).
        """
        rng_t, rng_eps = jax.random.split(rng)
        b = x.shape[0]
        t = jax.random.uniform(rng_t, (b,) + (1,) * (x.ndim - 1), dtype=jnp.float32)
        xt, eps = self.perturb(rng_eps, x, t)
        eps_pred = eps_model(xt, t, forcing)
        err = eps_pred.astype(jnp.float32) - eps.astype(jnp.float32)
        return jnp.mean(err**2)

    # -- reverse-step helpers (used by the sampler) ------------------------
    def denoise(self, x, t, eps):
        """Predicted x0 given x_t and predicted noise (fp32 schedule math)."""
        mu = self.mu(t)
        sigma = self.sigma(t)
        return (x - sigma.astype(x.dtype) * eps) / mu.astype(x.dtype)

    def renoise(self, x0, t, eps):
        """DDIM-style re-noising of a denoised estimate at time t."""
        mu = self.mu(t)
        sigma = self.sigma(t)
        return mu.astype(x0.dtype) * x0 + sigma.astype(x0.dtype) * eps
