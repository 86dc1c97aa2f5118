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
import numpy as np
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


def make_device_data_train_step(
    eps_model_apply: Callable,
    process,
    optimizer: optax.GradientTransformation,
    window: int,
    ema_rates: Sequence[float] = (0.9999,),
    loss_scaling: float = 1.0,
    remat: bool = False,
) -> Callable:
    """Train step over a device-resident dataset: windows are gathered in
    HBM, so only [rounds, B] int32 indices cross the host-device link.

    This is the TPU-first replacement for per-step batch shipping — on hosts
    with slow interconnect to the accelerator the 100+ MB/step transfer
    dominates, while an on-device gather of the same bytes runs at HBM
    bandwidth (<1 ms).  The production 8-year COSMO dataset is ~18 GB fp32 /
    ~9 GB bf16 and fits HBM alongside the 72M-param training state.

    ``train_step(state, data, idx, rng)`` with data [T, C, H, W] (any float
    dtype) and idx [rounds, B] window-start frames.  ``remat=True``
    rematerializes the network forward in the backward pass, trading ~1/3
    more FLOPs for activation memory (larger per-chip microbatches).
    """

    net_apply = jax.checkpoint(eps_model_apply) if remat else eps_model_apply

    def loss_fn(params, data, idx, rng):
        w = window
        frame_idx = idx[:, None] + jnp.arange(w)[None, :]  # [B, w]
        xw = jnp.take(data, frame_idx, axis=0)  # [B, w, C, H, W]
        b = xw.shape[0]
        # -> NHWC with frame-major flattened channels [B, H, W, w*C]
        xw = jnp.moveaxis(xw, (1, 2), (3, 4))  # [B, H, W, w, C]
        xw = xw.reshape(b, xw.shape[1], xw.shape[2], -1).astype(jnp.float32)
        return (
            process.loss(
                rng, lambda xt, t, forcing: net_apply(params, xt, t), xw
            )
            * loss_scaling
        )

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, data, idx, rng):
        rounds = idx.shape[0]
        rngs = jax.random.split(rng, rounds)

        if rounds == 1:
            loss, grads = grad_fn(state.params, data, idx[0], rngs[0])
        else:
            def accum(carry, inp):
                idx_r, r = inp
                loss_i, g_i = grad_fn(state.params, data, idx_r, r)
                g_sum, l_sum = carry
                return (jax.tree.map(jnp.add, g_sum, g_i), l_sum + loss_i), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, l_sum), _ = jax.lax.scan(
                accum, (zeros, jnp.zeros((), jnp.float32)), (idx, rngs)
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


def upload_dataset(
    data_source,
    total_frames: int,
    dtype=jnp.float32,
    sharding=None,
    chunk_frames: int = 256,
):
    """Upload a [T, C, H, W] dataset to device HBM in chunks.

    ``data_source[i:j]`` must yield float32 numpy blocks (h5 dataset or
    array).  Returns the device array (replicated under ``sharding``).
    """
    shape = (total_frames,) + tuple(data_source.shape[1:])
    buf = jnp.zeros(shape, dtype)
    if sharding is not None:
        buf = jax.device_put(buf, sharding)

    upd = jax.jit(
        lambda b, chunk, start: jax.lax.dynamic_update_slice(
            b, chunk.astype(dtype), (start,) + (0,) * (len(shape) - 1)
        ),
        donate_argnums=(0,),
    )
    for t0 in range(0, total_frames, chunk_frames):
        t1 = min(t0 + chunk_frames, total_frames)
        chunk = jnp.asarray(np.asarray(data_source[t0:t1], np.float32))
        buf = upd(buf, chunk, t0)
    return buf
