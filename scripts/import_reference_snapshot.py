"""Import a reference torch network snapshot into this framework's format.

The reference releases trained weights as pickled
``network-snapshot-{kdata}{-rate}.pkl`` files holding
``EasyDict(dataset_kwargs, pipeline, ema=<fp16 torch ScoreUNet>)``
(written at reference training_loop.py:240-267, consumed at
exp/downscaling.py:110-126).  Every published experiment config starts from
``network-snapshot-0186646-0.999900.pkl``, so running the paper's actual
weights requires this converter.

The unpickler needs torch (installed) but NOT the reference package: any
non-torch class in the pickle stream is materialized as a generic stub that
records its attributes, and the module tree is walked through the
``_parameters`` / ``_buffers`` / ``_modules`` dicts — identical to
``state_dict()`` without importing reference code.

Weight-layout conversion (torch -> flax):
  Conv2d  [O, I, kh, kw]  ->  HWIO [kh, kw, I, O]
  Conv1d  [O, I, 1] (attention qkv/proj) -> Dense [I, O]
  Linear  [O, I]          ->  Dense kernel [I, O]
fp16 snapshot payloads are widened to fp32.

The architecture is inferred entirely from the state dict (head shapes ->
hidden_channels, per-level project counts -> hidden_blocks, qkv presence ->
attention_levels, map_layer0 -> noise features / embedding_dim), so the
converter needs no YAML for the model.  The emitted snapshot directory
(params.msgpack + config.yaml) is directly consumable by
``experiment.py predict``; ``network_kwargs.norm_ddof = 1`` pins the zuko
LayerNorm (unbiased-variance) semantics the reference net was trained with.

Usage:
  python scripts/import_reference_snapshot.py \
      --snapshot network-snapshot-0186646-0.999900.pkl \
      --out runs/imported/network-snapshot-0186646-0.999900
"""

from __future__ import annotations

import argparse
import io
import pickle
import re
import sys
from typing import Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# stub-tolerant unpickling


class _Stub:
    """Stands in for any reference-package class in the pickle stream."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


class _StubDict(dict):
    """Stub for dict subclasses (the reference's util.EasyDict)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


class _SnapshotUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.split(".")[0] in ("torch", "collections", "numpy", "builtins"):
            return super().find_class(module, name)
        if "EasyDict" in name:
            return _StubDict
        stub = type(name, (_Stub,), {"__module__": module})
        return stub


def load_reference_snapshot(path: str):
    """Unpickle a reference snapshot without the reference package.

    Returns ``(state_dict, meta)``: flat {dotted torch name: fp32 ndarray}
    of the EMA network, plus extracted dataset/pipeline metadata.
    """
    with open(path, "rb") as f:
        snap = _SnapshotUnpickler(f).load()
    data = snap if isinstance(snap, dict) else snap.__dict__
    ema = data.get("ema")
    if ema is None:
        raise ValueError(f"{path}: no 'ema' network in snapshot (keys: {list(data)})")

    sd: Dict[str, np.ndarray] = {}

    def walk(mod, prefix=""):
        d = getattr(mod, "__dict__", {})
        for name, p in (d.get("_parameters") or {}).items():
            if p is not None:
                sd[prefix + name] = p.detach().cpu().float().numpy()
        for name, b in (d.get("_buffers") or {}).items():
            if b is not None:
                sd[prefix + name] = b.detach().cpu().float().numpy()
        for name, m in (d.get("_modules") or {}).items():
            if m is not None:
                walk(m, prefix + name + ".")

    walk(ema)

    meta = {}
    dk = data.get("dataset_kwargs")
    if isinstance(dk, dict):
        meta["dataset_kwargs"] = {
            k: v for k, v in dk.items() if isinstance(v, (int, float, str, bool))
        }
    pipe = data.get("pipeline")
    eta = getattr(pipe, "eta", None)
    if eta is None and isinstance(getattr(pipe, "__dict__", None), dict):
        eta = pipe.__dict__.get("eta")
    meta["eta"] = float(eta) if eta is not None else 1e-3
    return sd, meta


# ---------------------------------------------------------------------------
# architecture inference + layout conversion


def infer_architecture(sd: Dict[str, np.ndarray]) -> dict:
    """Reconstruct the constructor arguments from the state dict alone."""
    heads = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(r"unet\.heads\.(\d+)(?:\.0)?\.weight", k))
    )
    n_levels = len(heads)
    hidden_channels = []
    for i in range(n_levels):
        key = f"unet.heads.{i}.weight" if i == 0 else f"unet.heads.{i}.0.weight"
        hidden_channels.append(int(sd[key].shape[0]))
    in_channels = int(sd["unet.heads.0.weight"].shape[1])
    kernel_size = int(sd["unet.heads.0.weight"].shape[-1])
    hidden_blocks, attention_levels = [], []
    for i in range(n_levels):
        n_blocks = sum(
            1
            for k in sd
            if re.fullmatch(rf"unet\.descent\.{i}\.\d+\.project\.0\.weight", k)
        )
        hidden_blocks.append(n_blocks)
        if any(
            re.fullmatch(rf"unet\.descent\.{i}\.\d+\.qkv\.weight", k) for k in sd
        ):
            attention_levels.append(i)
    arch = dict(
        channels=in_channels,
        embedding_dim=int(sd["map_layer1.weight"].shape[0]),
        noise_features=int(sd["map_layer0.weight"].shape[1]),
        hidden_channels=hidden_channels,
        hidden_blocks=hidden_blocks,
        attention_levels=attention_levels,
        kernel_size=kernel_size,
        forcing_dim=(
            int(sd["map_forcing.weight"].shape[1]) if "map_forcing.weight" in sd else 0
        ),
        norm_ddof=1,  # zuko LayerNorm semantics (unbiased variance)
    )
    return arch


def _conv(sd, name) -> Tuple[np.ndarray, np.ndarray]:
    w = sd[name + ".weight"]
    return np.transpose(w, tuple(range(2, w.ndim)) + (1, 0)), sd[name + ".bias"]


def _dense(sd, name) -> Tuple[np.ndarray, np.ndarray]:
    w = sd[name + ".weight"]
    if w.ndim == 3:  # Conv1d(kernel_size=1) used as a position-wise Dense
        assert w.shape[-1] == 1, w.shape
        w = w[..., 0]
    return w.T, sd[name + ".bias"]


def convert_state_dict(sd: Dict[str, np.ndarray], arch: dict) -> dict:
    """Flat torch state dict -> this framework's nested flax params."""
    p: Dict[str, dict] = {}

    def put(path: str, kernel: np.ndarray, bias: np.ndarray):
        p[path] = {"kernel": kernel, "bias": bias}

    put("map_layer0", *_dense(sd, "map_layer0"))
    put("map_layer1", *_dense(sd, "map_layer1"))
    if "map_forcing.weight" in sd:
        put("map_forcing", *_dense(sd, "map_forcing"))

    n_levels = len(arch["hidden_blocks"])
    unet: Dict[str, dict] = {}

    def uput(path: str, kernel: np.ndarray, bias: np.ndarray):
        unet[path] = {"kernel": kernel, "bias": bias}

    for i in range(n_levels):
        tname = f"unet.heads.{i}" if i == 0 else f"unet.heads.{i}.0"
        uput(f"head{i}", *_conv(sd, tname))
        # torch tails hold levels in reversed order (model/nn.py:216); level 0
        # is a bare conv, others Sequential(LayerNorm, Upsample, conv)[2]
        j = n_levels - 1 - i
        tname = f"unet.tails.{j}" if i == 0 else f"unet.tails.{j}.2"
        uput(f"tail{i}", *_conv(sd, tname))

        has_attn = i in arch["attention_levels"]
        for stage, torch_stage, torch_level in (
            ("down", "descent", i),
            ("up", "ascent", n_levels - 1 - i),  # ascent is stored reversed
        ):
            for bi in range(arch["hidden_blocks"][i]):
                m = bi * 2 if has_attn else bi
                base = f"unet.{torch_stage}.{torch_level}.{m}"
                blk = f"{stage}{i}_block{bi}"
                uput(f"{blk}/project", *_dense(sd, f"{base}.project.0"))
                uput(f"{blk}/conv0", *_conv(sd, f"{base}.residue.1"))
                uput(f"{blk}/conv1", *_conv(sd, f"{base}.residue.3"))
                if has_attn:
                    abase = f"unet.{torch_stage}.{torch_level}.{m + 1}"
                    ablk = f"{stage}{i}_attn{bi}"
                    uput(f"{ablk}/qkv", *_dense(sd, f"{abase}.qkv"))
                    uput(f"{ablk}/proj_out", *_dense(sd, f"{abase}.proj_out"))

    nested: dict = {}
    for path, leaf in p.items():
        nested[path] = leaf
    unest: dict = {}
    for path, leaf in unet.items():
        parts = path.split("/")
        cur = unest
        for part in parts[:-1]:
            cur = cur.setdefault(part, {})
        cur[parts[-1]] = leaf
    nested["unet"] = unest
    return {"params": nested}


def import_snapshot(snapshot_path: str, out_dir: str, window: int = None,
                    num_features: int = None, spatial_res: int = None) -> str:
    """Full conversion: reference .pkl -> our snapshot directory."""
    from climate2weather_tpu.training.checkpoint import save_snapshot
    import os

    sd, meta = load_reference_snapshot(snapshot_path)
    arch = infer_architecture(sd)
    params = convert_state_dict(sd, arch)
    n_params = sum(v.size for v in _leaves(params))
    print(f"Inferred architecture: {arch}")
    print(f"Converted {n_params / 1e6:.1f}M parameters")

    dk = meta.get("dataset_kwargs", {})
    window = window or int(dk.get("window", 13))
    num_features = num_features or int(dk.get("num_features", arch["channels"] // window))
    spatial_res = spatial_res or int(dk.get("spatial_res", 128))
    assert arch["channels"] == num_features * window, (
        f"channels {arch['channels']} != num_features*window "
        f"{num_features}*{window} — pass --window/--num-features explicitly"
    )
    config = {
        "network_kwargs": arch,
        "pipeline_kwargs": {"class_name": "sda_pipeline", "eta": meta["eta"]},
        "dataset_kwargs": {
            "train": {
                "class_name": "cosmo_dataset",
                "window": window,
                "num_features": num_features,
                "spatial_res": spatial_res,
            }
        },
        "imported_from": os.path.basename(snapshot_path),
    }
    run_dir, name = os.path.split(out_dir.rstrip("/"))
    m = re.search(r"(\d{7})(?:-(.*))?$", name)
    kdata = int(m.group(1)) if m else 0
    rate = (m.group(2) if m and m.group(2) else "imported")
    path = save_snapshot(run_dir or ".", kdata, rate, params, config)
    want = os.path.join(run_dir or ".", name)
    if path != want:
        os.replace(path, want)
        path = want
    print(f"Wrote {path}")
    return path


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--snapshot", required=True, help="reference .pkl snapshot")
    ap.add_argument("--out", required=True, help="output snapshot directory")
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--num-features", type=int, default=None)
    ap.add_argument("--spatial-res", type=int, default=None)
    args = ap.parse_args()
    import_snapshot(
        args.snapshot, args.out,
        window=args.window, num_features=args.num_features,
        spatial_res=args.spatial_res,
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
