#!/bin/bash
# Round-5 phase 7 (last in queue): retry of the Medium on-device artifact
# re-emission — its first attempt's 60-min compile timed out; only eats
# whatever wall-clock remains after the measurement phases.
set -x
cd "$(dirname "$0")/.."

# CM-1 serving row (its phase-5 attempt died to a transient TPU worker
# crash; the worker recovers on the next process)
timeout 3600 python scripts/bench_serve.py --dataset npz:data/pointmaze_umaze_expert.npz \
  --env PointMaze_UMaze-v3 --policy-type dynamics-aware --action-horizon 16 \
  --n-candidates 8 --clients 4 --requests-per-client 8 \
  --checkpoint logs/npz_data_pointmaze_umaze_expert.npz/pm_r5_cm/checkpoint_step_1560.orbax \
  --sampler consistency --sampling-timesteps 1
echo PHASE7_CM_SERVE_DONE

PMM=$(ls -d logs/npz_data_pointmaze_medium_expert400.npz/pm_med_r3/checkpoint_step_*.orbax | sort -t_ -k3 -n | tail -1)
timeout 5400 python scripts/eval_ondevice.py --checkpoint "$PMM" \
  --dataset npz:data/pointmaze_medium_expert400.npz --map medium \
  --batch 128 --n-replans 38 --action-horizon 16 \
  --projection --wall-aware --n-candidates 8 --wall-slack 0.03 --seed 42
echo PHASE7_ALL_DONE
