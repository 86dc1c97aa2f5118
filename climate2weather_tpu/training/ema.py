"""Exponential moving averages of parameters as pytree lerps.

Parity: the reference ``StandardEMA`` (src/thor/ema.py:6-42) keeps
deep-copied shadow networks and lerps per-parameter with
``p_ema = r * p_ema + (1 - r) * p_net`` at default rate 0.9999, supporting
multiple rates.

TPU-first: EMAs are just parameter pytrees updated with ``jax.tree.map``
inside the jitted train step — no module copies, no Python-side loops, and
the lerp fuses with the optimizer update under XLA.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def rate_key(rate: float) -> str:
    """Stable string key for an EMA rate (used in snapshot suffixes, matching
    the reference's ``-{rate:.6f}`` naming, src/thor/ema.py:34)."""
    return f"{rate:.6f}"


def ema_init(params, rates: Sequence[float] = (0.9999,)) -> Dict[str, object]:
    """One fp32 copy of ``params`` per rate, keyed by :func:`rate_key`.

    Must be a real copy: sharing buffers with ``params`` would make the
    donated train-step state donate the same buffer twice.
    """
    return {
        rate_key(r): jax.tree.map(
            lambda p: jnp.array(p, jnp.float32, copy=True), params
        )
        for r in rates
    }


def ema_update(emas: Dict[str, object], params, rates: Sequence[float]):
    """p_ema <- r * p_ema + (1 - r) * p_net for every tracked rate."""
    out = {}
    for r in rates:
        k = rate_key(r)
        out[k] = jax.tree.map(
            lambda pe, pn: pe * r + pn.astype(pe.dtype) * (1.0 - r),
            emas[k],
            params,
        )
    return out
