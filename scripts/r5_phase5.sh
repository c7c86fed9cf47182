#!/bin/bash
# Round-5 phase 5 (wrap-up): the composed serving table re-measured with
# the pre-warmed batched server (compiles out of the timed window), plus
# the warm-start row in its honest serialized mode.
set -x
cd "$(dirname "$0")/.."

UD="npz:data/pointmaze_umaze_expert.npz"
PM="logs/npz_data_pointmaze_umaze_expert.npz/pm_r3/checkpoint_step_3900.orbax"
CM="logs/npz_data_pointmaze_umaze_expert.npz/pm_r5_cm/checkpoint_step_1560.orbax"

SERVE="timeout 3600 python scripts/bench_serve.py --dataset $UD --env PointMaze_UMaze-v3 \
  --policy-type dynamics-aware --action-horizon 16 --n-candidates 8 --clients 4 --requests-per-client 8"
$SERVE --checkpoint "$PM" --sampling-timesteps 100
$SERVE --checkpoint "$PM" --sampling-timesteps 100 --warm-start-t 40
$SERVE --checkpoint "$CM" --sampler consistency --sampling-timesteps 1
echo PHASE5_SERVE_DONE

# Solver-sensitivity control for the on-device HC number: the r4 chain
# script ran PGS while RESULTS said jacobi (ADVICE r4 #4) — measure both
# on the same checkpoint/seed so the quoted number names its solver.
HC="logs/npz_data_halfcheetah_mppi.npz+npz_data_halfcheetah_engine_r4b.npz/hc_r4b/checkpoint_step_52200.orbax"
HCD="npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r4b.npz"
timeout 3600 python scripts/eval_ondevice_locomotion.py --checkpoint "$HC" \
  --dataset "$HCD" --env HalfCheetah-v5 --backend physics --solver pgs \
  --batch 30 --n-replans 62 --action-horizon 16 --skip-conditioned-action \
  --seed 42
# Retry of the Medium on-device artifact re-emission (its 60-min compile
# timed out in phase 2's quick block); last in the queue so it only eats
# leftover wall-clock.
PMM=$(ls -d logs/npz_data_pointmaze_medium_expert400.npz/pm_med_r3/checkpoint_step_*.orbax | sort -t_ -k3 -n | tail -1)
timeout 5400 python scripts/eval_ondevice.py --checkpoint "$PMM" \
  --dataset npz:data/pointmaze_medium_expert400.npz --map medium \
  --batch 128 --n-replans 38 --action-horizon 16 \
  --projection --wall-aware --n-candidates 8 --wall-slack 0.03 --seed 42
echo PHASE5_ALL_DONE
