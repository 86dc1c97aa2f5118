#!/bin/bash
# Production training launch (reference run_training.sh:32-48 hyperparameters,
# TPU-native: devices come from the JAX runtime; multi-host pods set
# JAX_COORDINATOR_ADDRESS and launch one process per host).
#
# The run is wrapped in the stall supervisor
# (climate2weather_tpu/training/supervisor.py): if the device runtime wedges
# (no trainer output for --stall-timeout), the process group is killed and
# relaunched, and the trainer's always-on load_latest resume continues the
# run bit-exactly (soak-verified, docs/soak/SOAK.md). Set C2W_NO_SUPERVISOR=1
# to launch the bare trainer (e.g. under SLURM requeueing, which plays the
# same role).
#
# Usage: ./run_training.sh RUN_DIR RUN_ID TRAIN_H5 [extra train.py flags...]
set -euo pipefail

RUN_DIR=${1:?usage: run_training.sh RUN_DIR RUN_ID TRAIN_H5 [flags...]}
RUN_ID=${2:?}
TRAIN_H5=${3:?}
shift 3

LAUNCH=(python train.py)
if [ -z "${C2W_NO_SUPERVISOR:-}" ]; then
  mkdir -p "$RUN_DIR/$RUN_ID"
  LAUNCH=(python -m climate2weather_tpu.training.supervisor
    --stall-timeout 900 --max-restarts 8
    --steady-pattern 'Status:'
    --journal "$RUN_DIR/$RUN_ID/supervisor.jsonl"
    -- python train.py)
fi

exec "${LAUNCH[@]}" \
  --run-dir "$RUN_DIR" \
  --run-id "$RUN_ID" \
  --train-data "$TRAIN_H5" \
  --spatial-res 128 \
  --num-features 4 \
  --markov-order 6 \
  --cache-data \
  --total-ndata 180Mi \
  --batch 512 \
  --batch-gpu 128 \
  --lr 0.0001 \
  --status 20Ki \
  --snapshot 1Mi \
  --checkpoint 2Mi \
  --logging 5Ki \
  --valid 1Mi \
  --seed 42 \
  "$@"
