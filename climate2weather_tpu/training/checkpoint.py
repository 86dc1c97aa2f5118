"""Checkpointing and inference snapshots — pure-pytree, pickle-free.

Two artifact kinds, mirroring the reference (SURVEY.md §5):

1. **Training state** ``training-state-{kdata:07d}.ckpt`` — the full
   :class:`TrainState` (params, optimizer moments, EMAs, step) serialized
   with flax msgpack, plus a JSON meta header.  ``load_latest`` regex-scans
   the run dir and resumes from the highest kdata (reference
   src/thor/checkpoint.py:61-79, wired unconditionally at startup,
   training_loop.py:132-139).

2. **Inference snapshot** ``network-snapshot-{kdata:07d}-{rate}.npz-dir`` —
   EMA params + all configs needed to rebuild the model and sampler
   (the reference pickles live code objects, training_loop.py:240-267;
   here a snapshot is data only: params.msgpack + config.yaml).
"""

from __future__ import annotations

import json
import os
import queue
import re
import threading
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import serialization

SNAPSHOT_PREFIX = "network-snapshot-"
CKPT_PATTERN = r"training-state-(\d+)\.ckpt"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


class CheckpointIO:
    """Save/restore a named collection of state objects.

    Objects may be pytrees (restored via flax ``from_state_dict``), dicts,
    or anything flax can serialize.  Mirrors the duck-typed reference
    ``CheckpointIO`` (src/thor/checkpoint.py:9-59) with msgpack instead of
    torch pickles.
    """

    def __init__(self, **state_objs: Any):
        self.state_objs = state_objs

    def save(self, path: str, verbose: bool = True) -> None:
        if verbose:
            print(f"Saving {path} ... ", end="", flush=True)
        payload = {
            name: serialization.to_bytes(_to_host(obj))
            for name, obj in self.state_objs.items()
            if obj is not None
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            header = json.dumps({k: len(v) for k, v in payload.items()}).encode()
            f.write(len(header).to_bytes(8, "little"))
            f.write(header)
            for k in sorted(payload):
                f.write(payload[k])
        os.replace(tmp, path)
        if verbose:
            print("done.")

    def load(self, path: str, verbose: bool = True) -> dict:
        if verbose:
            print(f"Loading {path} ... ", end="", flush=True)
        with open(path, "rb") as f:
            hlen = int.from_bytes(f.read(8), "little")
            sizes = json.loads(f.read(hlen).decode())
            blobs = {}
            for k in sorted(sizes):
                blobs[k] = f.read(sizes[k])
        restored = {}
        for name, obj in self.state_objs.items():
            if obj is None or name not in blobs:
                continue
            restored[name] = serialization.from_bytes(obj, blobs[name])
            self.state_objs[name] = restored[name]
        if verbose:
            print("done.")
        return restored

    def load_latest(
        self, run_dir: str, pattern: str = CKPT_PATTERN, verbose: bool = True
    ) -> Optional[str]:
        """Resume from the highest-numbered checkpoint in ``run_dir``;
        returns its path or None (reference src/thor/checkpoint.py:61-79)."""
        try:
            entries = os.scandir(run_dir)
        except FileNotFoundError:
            return None
        fnames = [
            e.name for e in entries if e.is_file() and re.fullmatch(pattern, e.name)
        ]
        if not fnames:
            return None
        latest = max(fnames, key=lambda x: int(re.fullmatch(pattern, x).group(1)))
        path = os.path.join(run_dir, latest)
        self.load(path, verbose=verbose)
        return path


class AsyncWriter:
    """Single background thread for checkpoint/snapshot writes.

    The reference blocks the step loop on ``fabric.save``
    (training_loop.py:353-363); here the device->host fetch + file write run
    off the step path.  At most one job is in flight: ``submit`` blocks until
    the previous write finished, bounding host memory to one state copy.
    Exceptions surface on the next ``submit``/``flush`` instead of being
    swallowed.
    """

    def __init__(self):
        self._q: queue.Queue = queue.Queue(maxsize=1)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 - reraised on submit/flush
                self._err = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err

    def submit(self, fn: Callable[[], None]):
        # Queue(maxsize=1) alone does not bound in-flight jobs to one: the
        # worker dequeues immediately, so the queue is empty while a write
        # runs and a second submit would succeed (3 host state copies live).
        # join() waits until the previous write actually finished.
        self._q.join()
        self._check()
        self._q.put(fn)

    def flush(self):
        self._q.join()
        self._check()

    def close(self):
        self._q.put(None)
        self._q.join()
        self._check()


def prune_checkpoints(
    run_dir: str, keep_last: int, pattern: str = CKPT_PATTERN
) -> None:
    """Delete all but the ``keep_last`` highest-numbered training states."""
    try:
        entries = os.scandir(run_dir)
    except FileNotFoundError:
        return
    fnames = [
        e.name for e in entries if e.is_file() and re.fullmatch(pattern, e.name)
    ]
    fnames.sort(key=lambda x: int(re.fullmatch(pattern, x).group(1)))
    for name in fnames[: max(0, len(fnames) - keep_last)]:
        os.remove(os.path.join(run_dir, name))


# ---------------------------------------------------------------------------
# Inference snapshots


def save_snapshot(
    run_dir: str,
    kdata: int,
    rate_suffix: str,
    params,
    config: dict,
    half_precision: bool = False,
) -> str:
    """Write ``network-snapshot-{kdata:07d}-{rate}/`` with params + config.

    ``config`` must contain everything needed to rebuild the sampler:
    model kwargs, dataset kwargs (window!), process kwargs.
    """
    name = f"{SNAPSHOT_PREFIX}{kdata:07d}-{rate_suffix}"
    snap_dir = os.path.join(run_dir, name)
    os.makedirs(snap_dir, exist_ok=True)
    if half_precision:
        # cast on device before the fetch: halves the bytes over the (slow)
        # device->host link, matching the reference's fp16 snapshot payload
        # (training_loop.py:240-267)
        params = jax.tree.map(
            lambda p: np.asarray(p, np.float16)
            if isinstance(p, np.ndarray)
            else np.asarray(jax.device_get(jnp.asarray(p).astype(jnp.float16))),
            params,
        )
    else:
        params = _to_host(params)
    with open(os.path.join(snap_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(snap_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    return snap_dir


def load_snapshot(snap_dir: str):
    """Returns ``(params, config)`` from a snapshot directory."""
    with open(os.path.join(snap_dir, "config.yaml")) as f:
        config = yaml.safe_load(f)
    with open(os.path.join(snap_dir, "params.msgpack"), "rb") as f:
        raw = f.read()
    params = serialization.msgpack_restore(raw)
    params = jax.tree.map(lambda p: jnp.asarray(p, jnp.float32), params)
    return params, config
