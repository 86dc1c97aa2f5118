"""Model summary and memory accounting.

Parity: the reference's hook-based ``print_module_summary`` and
``count_parameters_and_buffers`` (util.py:156-247,271-287).  In JAX the
module tree is the params pytree, so the summary is a walk over it plus a
jitted shape evaluation for activations.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def param_counts(params) -> Dict[str, int]:
    """Parameter count per top-level module path."""
    counts: Dict[str, int] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        # group by the first two levels below 'params'
        keys = [k for k in keys if k != "params"]
        group = "/".join(keys[:2]) if keys else "<root>"
        counts[group] = counts.get(group, 0) + int(np.prod(leaf.shape))
    return counts


def print_module_summary(params, name: str = "model") -> int:
    """Print a per-module parameter table; returns the total count
    (reference util.print_module_summary, util.py:156-247)."""
    counts = param_counts(params)
    total = sum(counts.values())
    width = max((len(k) for k in counts), default=10)
    print(f"{name} parameter summary")
    print("-" * (width + 16))
    for k in sorted(counts):
        print(f"{k:<{width}}  {counts[k]:>12,}")
    print("-" * (width + 16))
    print(f"{'TOTAL':<{width}}  {total:>12,}  ({total / 1e6:.2f}M)")
    return total


def tabulate_module(module, *example_args, **kwargs) -> str:
    """Full flax tabulation (per-layer output shapes + params + FLOPs) —
    the detailed analogue of the reference's hook-based module summary."""
    import jax
    from flax import linen as nn

    return nn.tabulate(
        module,
        jax.random.PRNGKey(0),
        compute_flops=True,
        compute_vjp_flops=False,
        **kwargs,
    )(*example_args)


def tree_bytes(tree) -> int:
    """Total bytes of all array leaves (params / optimizer state / EMA)."""
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(tree))


def training_memory_report(state) -> Dict[str, float]:
    """MB per training-state component (reference util.py:271-287)."""
    report = {
        "params_MB": tree_bytes(state.params) / 2**20,
        "opt_state_MB": tree_bytes(state.opt_state) / 2**20,
        "emas_MB": tree_bytes(state.emas) / 2**20,
    }
    report["total_MB"] = sum(report.values())
    return report
