#!/bin/bash
# Round-5 phase 7 (last in queue): retry of the Medium on-device artifact
# re-emission — its first attempt's 60-min compile timed out; only eats
# whatever wall-clock remains after the measurement phases.
set -x
cd "$(dirname "$0")/.."
PMM=$(ls -d logs/npz_data_pointmaze_medium_expert400.npz/pm_med_r3/checkpoint_step_*.orbax | sort -t_ -k3 -n | tail -1)
timeout 5400 python scripts/eval_ondevice.py --checkpoint "$PMM" \
  --dataset npz:data/pointmaze_medium_expert400.npz --map medium \
  --batch 128 --n-replans 38 --action-horizon 16 \
  --projection --wall-aware --n-candidates 8 --wall-slack 0.03 --seed 42
echo PHASE7_ALL_DONE
