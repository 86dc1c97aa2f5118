#!/bin/bash
# Post-processing for the year-2014 production run (VERDICT r4 next-step 4):
# runs the full fast test tier (the round's serialization window — never
# concurrently with chip work, CLAUDE.md), then year-scale metrics at the
# pre-declared stride-4 protocol (every 24 h, 365 frames), then the figure
# set. All CPU-heavy; the chip is idle between the year run and the sweep.
set -eu
cd "$(dirname "$0")/.."

if [ -z "${C2W_IMMUTABLE_COPY:-}" ]; then
  mkdir -p runs
  cp "$0" "runs/$(basename "$0").running.$$"
  C2W_IMMUTABLE_COPY=1 exec bash "runs/$(basename "$0").running.$$" "$@"
fi

EXP=runs/year2014_meso128/001_year2014_meso128_dpm64

echo "[year_post] fast test tier at $(date -u +%FT%TZ)"
python -m pytest tests/ -q -m "not slow" 2>&1 | tail -3

echo "[year_post] dryrun_multichip at $(date -u +%FT%TZ)"
python __graft_entry__.py 2>&1 | tail -2

echo "[year_post] year metrics (time-stride 4) at $(date -u +%FT%TZ)"
C2W_PLATFORM=cpu python experiment.py metrics run "$EXP" --time-stride 4

echo "[year_post] figures at $(date -u +%FT%TZ)"
for kind in rapsd calibration kde_and_pmf climate_grid timeseries windpower_dist; do
  C2W_PLATFORM=cpu python experiment.py figures "$kind" "$EXP" \
    || echo "[year_post] figure $kind failed (non-blocking)"
done
echo "[year_post] DONE at $(date -u +%FT%TZ)"
