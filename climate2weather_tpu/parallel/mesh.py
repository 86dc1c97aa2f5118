"""Device mesh construction and sharding helpers.

The parallelism surface required for reference parity (SURVEY.md §2.5):

- **data**: data-parallel training — batch sharded over the ``data`` axis,
  params replicated; XLA emits the gradient all-reduce over ICI (the
  reference's Fabric/NCCL DDP, train.py:93-100).
- **window**: sequence/temporal parallelism for sampling — the Markov-blanket
  window batch is embarrassingly parallel given x_t, so window chunks shard
  over this axis (the reference's CPU<->GPU streamed `BatchedScoreFunction`,
  src/thor/score.py:96-185, becomes a sharded on-device batch).
- ensemble sharding (samples over ranks, exp/downscaling.py:96-99) reuses
  the ``data`` axis at inference time.

A ``model`` axis is reserved in the axis-name vocabulary so tensor-parallel
shardings can be added without breaking call sites; the 72M-param production
model does not need it (SURVEY.md §2.5 row TP/PP).

Multi-host: call :func:`maybe_init_distributed` before mesh construction;
``jax.devices()`` then spans all hosts and shardings ride ICI/DCN as laid
out by XLA.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
WINDOW_AXIS = "window"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when launched multi-host (no-op otherwise)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def configure_platform() -> None:
    """Honor C2W_PLATFORM=cpu|tpu and C2W_HOST_DEVICES=N.  Needed because
    TPU plugins may register themselves at interpreter start and win over
    the JAX_PLATFORMS env var; the config update after import reliably
    selects the backend.  C2W_HOST_DEVICES creates N virtual CPU devices
    (for exercising mesh paths without hardware)."""
    plat = os.environ.get("C2W_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    n = os.environ.get("C2W_HOST_DEVICES")
    if n:
        jax.config.update("jax_num_cpu_devices", int(n))


def make_mesh(
    data: Optional[int] = None,
    window: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, window, model) mesh over the available devices.

    ``data=None`` absorbs all remaining devices into the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (window * model) == 0, (n, window, model)
        data = n // (window * model)
    assert data * window * model == n, (
        f"mesh {data}x{window}x{model} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, window, model)
    return Mesh(arr, (DATA_AXIS, WINDOW_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, leading_none: int = 1) -> NamedSharding:
    """Shard the batch axis over ``data`` (and ``window`` when its size > 1,
    since both axes carry independent examples at train time).

    ``leading_none`` skips leading axes (e.g. the accumulation-rounds axis of
    [rounds, B, H, W, C]).
    """
    axes = (None,) * leading_none + ((DATA_AXIS, WINDOW_AXIS),)
    return NamedSharding(mesh, P(*axes))


def window_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a window batch [N, H, W, w*C] over the window axis (sampling)."""
    return NamedSharding(mesh, P((DATA_AXIS, WINDOW_AXIS)))


def shard_batch(batch, mesh: Mesh, leading_none: int = 1):
    """Device-put a host batch with the train-time batch sharding."""
    return jax.device_put(batch, batch_sharding(mesh, leading_none))
