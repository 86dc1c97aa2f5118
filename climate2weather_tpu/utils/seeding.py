"""Deterministic seeding helpers.

Parity: reference ``util.set_random_seed`` (util.py:27-29) — the effective
seed is a stable hash of ``(seed, rank, ...)`` so every process gets a
distinct but reproducible stream.  In JAX the analogue is deriving a
``jax.random.PRNGKey`` from the same hash.
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterable

import numpy as np


def derive_seed(*args: Iterable) -> int:
    """Stable 31-bit seed from arbitrary hashable components.

    Uses blake2 rather than Python's ``hash`` so results are stable across
    interpreter runs and hosts (Python randomizes ``hash`` for strings).
    """
    h = hashlib.blake2b(repr(tuple(args)).encode(), digest_size=8)
    return int.from_bytes(h.digest(), "little") % (1 << 31)


def set_random_seed(seed: int, *extra) -> int:
    """Seed python/numpy RNGs from ``derive_seed(seed, *extra)`` and return it."""
    s = derive_seed(seed, *extra)
    random.seed(s)
    np.random.seed(s)
    return s
