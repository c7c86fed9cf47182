#!/bin/bash
# Round-5 phase 1b: the UMaze few-call distillation table + the composed
# serving latency-stack measurement (VERDICT r5 item 1a/1b). Serial — one
# chip. Run after r5_phase1.sh (needs pm_r5_pd / pm_r5_cm).
set -x
cd "$(dirname "$0")/.."

UD="npz:data/pointmaze_umaze_expert.npz"
PM="logs/npz_data_pointmaze_umaze_expert.npz/pm_r3/checkpoint_step_3900.orbax"
PDD="logs/npz_data_pointmaze_umaze_expert.npz/pm_r5_pd"
CM=$(ls -d logs/npz_data_pointmaze_umaze_expert.npz/pm_r5_cm/checkpoint_step_*.orbax | sort -t_ -k3 -n | tail -1)

EVAL="timeout 3600 python scripts/evaluate.py --dataset $UD --env PointMaze_UMaze-v3 \
  --policy-type dynamics-aware --action-horizon 16 --n-candidates 8 \
  --n-episodes 50 --seed 42 --batched"

# teacher DDIM at matched few-call budgets
for K in 1 2 4 10; do
  $EVAL --checkpoint "$PM" --sampler ddim --sampling-timesteps $K
done

# PD students at their halving-schedule budgets
for RK in "round_5_steps1 1" "round_4_steps3 3" "round_3_steps6 6"; do
  set -- $RK
  CKPT=$(ls -d "$PDD/$1"/checkpoint_step_*.orbax | sort -t_ -k3 -n | tail -1)
  $EVAL --checkpoint "$CKPT" --sampler ddim --sampling-timesteps $2
done

# CM student at 1/2/4 calls
for K in 1 2 4; do
  $EVAL --checkpoint "$CM" --sampler consistency --sampling-timesteps $K
done
echo PHASE1B_EVALS_DONE

# Composed serving product: {full chain, warm-start-40, CM-1} x {solo, 4 clients}
SERVE="timeout 3600 python scripts/bench_serve.py --dataset $UD --env PointMaze_UMaze-v3 \
  --policy-type dynamics-aware --action-horizon 16 --n-candidates 8 --clients 4 --requests-per-client 8"
$SERVE --checkpoint "$PM" --sampling-timesteps 100
$SERVE --checkpoint "$PM" --sampling-timesteps 100 --warm-start-t 40
$SERVE --checkpoint "$CM" --sampler consistency --sampling-timesteps 1
echo PHASE1B_ALL_DONE
