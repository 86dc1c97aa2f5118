"""Training state pytree and the jitted train step.

The train step is a single compiled function covering: gradient accumulation
(a ``lax.scan`` over microbatches — the reference's Python accumulation loop
with ``no_backward_sync``, training_loop.py:373-378), the AdamW update with
the per-step LR schedule (training_loop.py:380-384), and the EMA lerp
(training_loop.py:389-390).  Data parallelism comes from sharding the batch
over the mesh's ``data`` axis — XLA inserts the gradient all-reduce over ICI
(the reference's NCCL DDP allreduce, SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from climate2weather_tpu.training.ema import ema_init, ema_update


@struct.dataclass
class TrainState:
    """Replicated training state (a pure pytree; checkpointable as-is)."""

    step: jnp.ndarray  # int32 scalar; cur_ndata = step * batch_size
    params: Any
    opt_state: Any
    emas: Dict[str, Any]

    @property
    def cur_ndata_fn(self):  # convenience host-side: ndata = step * batch
        return lambda batch_size: int(self.step) * batch_size


def make_optimizer(lr_schedule: Callable, optimizer_kwargs: dict) -> optax.GradientTransformation:
    """AdamW with decoupled weight decay scaled by LR, matching torch.optim.AdamW
    semantics used by the reference (train.py:176-181)."""
    kwargs = dict(optimizer_kwargs)
    kwargs.pop("class_name", None)
    kwargs.pop("lr", None)
    betas = kwargs.pop("betas", (0.9, 0.999))
    weight_decay = kwargs.pop("weight_decay", 1e-3)
    eps = kwargs.pop("eps", 1e-8)
    return optax.adamw(
        learning_rate=lr_schedule,
        b1=betas[0],
        b2=betas[1],
        eps=eps,
        weight_decay=weight_decay,
    )


def init_train_state(
    params,
    optimizer: optax.GradientTransformation,
    ema_rates: Sequence[float] = (0.9999,),
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        emas=ema_init(params, ema_rates),
    )


def make_train_step(
    eps_model_apply: Callable,
    process,
    optimizer: optax.GradientTransformation,
    ema_rates: Sequence[float] = (0.9999,),
    loss_scaling: float = 1.0,
    channels_first: bool = False,
) -> Callable:
    """Build ``train_step(state, batch, rng) -> (state, loss)``.

    ``batch`` has shape [rounds, B, H, W, C] (or [rounds, B, C, H, W] with
    ``channels_first=True`` — the loader ships NCHW because host transposes
    are slow, and the device transposes to NHWC here for ~free).  The
    leading axis is gradient accumulation; pass rounds=1 when no
    accumulation is needed.  The whole step (accumulation scan, grad mean,
    AdamW, EMA) is one jit region.
    """

    def loss_fn(params, microbatch, rng):
        if channels_first:
            microbatch = jnp.transpose(microbatch, (0, 2, 3, 1))
        return process.loss(
            rng, lambda xt, t, forcing: eps_model_apply(params, xt, t), microbatch
        ) * loss_scaling

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, batch, rng):
        rounds = batch.shape[0]
        rngs = jax.random.split(rng, rounds)

        if rounds == 1:
            loss, grads = grad_fn(state.params, batch[0], rngs[0])
        else:
            def accum(carry, inp):
                mb, r = inp
                loss_i, g_i = grad_fn(state.params, mb, r)
                g_sum, l_sum = carry
                return (
                    jax.tree.map(jnp.add, g_sum, g_i),
                    l_sum + loss_i,
                ), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, l_sum), _ = jax.lax.scan(
                accum, (zeros, jnp.zeros((), jnp.float32)), (batch, rngs)
            )
            grads = jax.tree.map(lambda g: g / rounds, g_sum)
            loss = l_sum / rounds

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        emas = ema_update(state.emas, params, ema_rates)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                emas=emas,
            ),
            loss,
        )

    return train_step
