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
echo PHASE5_ALL_DONE
