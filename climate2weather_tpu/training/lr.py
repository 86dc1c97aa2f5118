"""Learning-rate schedules, parameterized by ndata (examples seen).

Parity: reference src/thor/lr.py — ``linear_learning_rate_schedule`` is the
wired production schedule (train.py:189-193, applied per-step at
training_loop.py:380-383); the EDM2 inverse-sqrt schedule is provided for
completeness.  Both are pure and jit-traceable.
"""

from __future__ import annotations

import jax.numpy as jnp

from climate2weather_tpu.utils.registry import register


@register("lr/linear")
def linear_learning_rate_schedule(cur_ndata, total_ndata, ref_lr):
    frac_done = cur_ndata / total_ndata
    return ref_lr * (1.0 - frac_done)


@register("lr/edm2")
def edm2_learning_rate_schedule(cur_ndata, batch_size, ref_lr, ref_batches, rampup_Mdata):
    lr = jnp.asarray(ref_lr, jnp.float32)
    if ref_batches > 0:
        lr = lr / jnp.sqrt(jnp.maximum(cur_ndata / (ref_batches * batch_size), 1.0))
    if rampup_Mdata > 0:
        lr = lr * jnp.minimum(cur_ndata / (rampup_Mdata * 1e6), 1.0)
    return lr


def make_schedule(lr_kwargs: dict, batch_size: int):
    """Build ``step -> lr`` from a config dict with ``func_name`` and kwargs
    (the reference's lr_kwargs surface, train.py:189-193); ``cur_ndata`` is
    derived as ``step * batch_size``."""
    from climate2weather_tpu.utils.registry import get_obj_by_name

    kwargs = dict(lr_kwargs)
    fn = get_obj_by_name(kwargs.pop("func_name"))

    def schedule(step):
        return fn(cur_ndata=step * batch_size, **kwargs)

    return schedule
