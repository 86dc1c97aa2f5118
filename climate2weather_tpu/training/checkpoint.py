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
import re
from typing import Any, Optional

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
        params = jax.tree.map(lambda p: np.asarray(p, np.float16), _to_host(params))
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
