"""Power-of-two ndata suffix parsing.

Parity: reference ``train.py:24-33`` — intervals and budgets are given in
"ndata" (number of training examples seen) with optional Ki/Mi/Gi suffixes.
"""

from __future__ import annotations


def parse_ndata(s) -> int:
    """Parse an int with optional power-of-two suffix: Ki=2^10, Mi=2^20, Gi=2^30."""
    if isinstance(s, int):
        return s
    s = str(s)
    if s.endswith("Ki"):
        return int(s[:-2]) << 10
    if s.endswith("Mi"):
        return int(s[:-2]) << 20
    if s.endswith("Gi"):
        return int(s[:-2]) << 30
    return int(s)


def format_ndata(n: int) -> str:
    """Inverse of :func:`parse_ndata` for pretty printing (exact only)."""
    for shift, suffix in ((30, "Gi"), (20, "Mi"), (10, "Ki")):
        if n and n % (1 << shift) == 0:
            return f"{n >> shift}{suffix}"
    return str(n)
