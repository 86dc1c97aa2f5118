"""Fabricate a trainer checkpoint from an archived inference snapshot.

Purpose (H3, round 5): the VM recycle destroyed ``runs/**`` including the
full production training state ``training-state-0009437.ckpt`` that
``H3_PREREG.md`` registered as the resume point.  The only durable artifact
is the committed 0.9999-EMA inference snapshot
(``artifacts/network-snapshot-0009437-0.999900/`` — fp16 params + config).
This script rebuilds a trainer-loadable ``TrainState`` from it so the
registered +4.19Mi extension can still run, with the deviation documented
in the prereg's deviations log BEFORE launch:

- ``params`` = the archived EMA-0.9999 params (fp32-cast) — the raw
  (non-averaged) 9.44Mi params are lost; the EMA point is the closest
  durable approximation and is itself the gating object of every eval.
- ``emas`` (both rates) = copies of the same params — the EMA trackers
  restart from the warm point.
- ``opt_state`` = fresh AdamW moments (Adam count 0 → standard bias
  correction, no transient blow-up) BUT with the LR-schedule count set to
  step so the registered absolute-ndata linear schedule is preserved:
  lr(9.44Mi) = ref_lr * (1 - 9437184/13631488) ≈ 9.2e-5 decaying to 0 at
  13.63Mi, exactly as pre-registered.  optax.adamw keeps bias-correction
  count (ScaleByAdamState) and schedule position (ScaleByScheduleState)
  separate, which is what makes this clean.
- ``step`` = ndata // batch (36864 for 9437184 / 256), so the loop's
  ndata accounting, snapshot naming, and InfiniteSampler stream position
  all resume at the true production position.

Usage:
  C2W_PLATFORM=cpu python scripts/fabricate_resume_state.py \
      --snapshot artifacts/network-snapshot-0009437-0.999900 \
      --out-dir runs/meso128 --ndata 9437184 --batch 256 \
      --lr 3e-4 --total-ndata 13631488 --ema-rates 0.9999,0.999
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climate2weather_tpu.parallel.mesh import configure_platform

configure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from climate2weather_tpu.training.checkpoint import (  # noqa: E402
    CheckpointIO,
    load_snapshot,
)
from climate2weather_tpu.training.ema import ema_init  # noqa: E402
from climate2weather_tpu.training.lr import make_schedule  # noqa: E402
from climate2weather_tpu.training.state import (  # noqa: E402
    TrainState,
    make_optimizer,
)


def set_schedule_count(opt_state, count: int):
    """Return ``opt_state`` with every ScaleByScheduleState.count set to
    ``count`` (the LR position), leaving Adam's bias-correction count alone."""
    hits = 0

    def walk(node):
        nonlocal hits
        if type(node).__name__ == "ScaleByScheduleState":
            hits += 1
            return node._replace(count=jnp.asarray(count, jnp.int32))
        if isinstance(node, tuple) and type(node).__name__ != "tuple":
            # namedtuple that isn't the target: rebuild field-wise
            return type(node)(*(walk(v) for v in node))
        if isinstance(node, tuple):
            return tuple(walk(v) for v in node)
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    out = walk(opt_state)
    assert hits == 1, f"expected exactly one ScaleByScheduleState, found {hits}"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True, help="inference snapshot dir")
    ap.add_argument("--out-dir", required=True, help="training run dir")
    ap.add_argument("--ndata", type=int, required=True,
                    help="absolute ndata of the snapshot (e.g. 9437184)")
    ap.add_argument("--batch", type=int, required=True)
    ap.add_argument("--lr", type=float, required=True,
                    help="ref_lr of the NEW schedule (H3: 3e-4)")
    ap.add_argument("--total-ndata", type=int, required=True,
                    help="total_ndata of the NEW schedule (H3: 13631488)")
    ap.add_argument("--ema-rates", default="0.9999,0.999")
    args = ap.parse_args()

    assert args.ndata % args.batch == 0
    step = args.ndata // args.batch
    rates = tuple(float(r) for r in args.ema_rates.split(","))

    print(f"Loading snapshot {args.snapshot} ...")
    params, _cfg = load_snapshot(args.snapshot)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"  {n_params / 1e6:.2f}M params")

    schedule = make_schedule(
        {"func_name": "lr/linear", "ref_lr": args.lr,
         "total_ndata": args.total_ndata},
        args.batch,
    )
    optimizer = make_optimizer(
        schedule, {"betas": [0.9, 0.999], "weight_decay": 1e-3}
    )
    opt_state = set_schedule_count(optimizer.init(params), step)

    state = TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        opt_state=opt_state,
        emas=ema_init(params, rates),
    )

    os.makedirs(args.out_dir, exist_ok=True)
    kdata = args.ndata // 1000
    path = os.path.join(args.out_dir, f"training-state-{kdata:07d}.ckpt")
    CheckpointIO(state=state, meta={"batch_size": args.batch}).save(path)
    lr_now = float(schedule(step))
    print(f"Fabricated {path}: step={step} (ndata={args.ndata}), "
          f"lr(step)={lr_now:.3e}, ema rates={rates}, fresh Adam moments.")


if __name__ == "__main__":
    main()
