#!/bin/bash
# Round-4 serving-stack composition (VERDICT r4 #4): one product table —
# {full-chain, warm-start, CM 1-call} x {solo, 4 clients} with quality.
# Serial TPU jobs. Quality rows use the canonical host protocol (n=50,
# seed 42, batched); latency rows use scripts/bench_serve.py.
set -x
cd "$(dirname "$0")/.."

UM_CKPT="logs/npz_data_pointmaze_umaze_expert.npz/pm_r3/checkpoint_step_3900.orbax"
UM_DATA="npz:data/pointmaze_umaze_expert.npz"
MED_CKPT="logs/npz_data_pointmaze_medium_expert400.npz/pm_med_r3/checkpoint_step_14300.orbax"
MED_DATA="npz:data/pointmaze_medium_expert400.npz"

# 0. CM students (1-call planners) for both maps
python scripts/distill.py --checkpoint "$UM_CKPT" --dataset "$UM_DATA" \
  --n-epochs 150 --run-name pm_r4_cm --log-dir logs
python scripts/distill.py --checkpoint "$MED_CKPT" --dataset "$MED_DATA" \
  --n-epochs 150 --run-name pm_med_r4_cm --log-dir logs

UM_CM=$(ls -td logs/*/pm_r4_cm/checkpoint_step_*.orbax | head -1)
MED_CM=$(ls -td logs/*/pm_med_r4_cm/checkpoint_step_*.orbax | head -1)

# 1. Quality rows (host protocol)
# UMaze full chain
python scripts/evaluate.py --checkpoint "$UM_CKPT" --dataset "$UM_DATA" \
  --env PointMaze_UMaze-v3 --policy-type dynamics-aware --n-candidates 8 \
  --n-episodes 50 --seed 42 --batched
# UMaze warm-start K=40
python scripts/evaluate.py --checkpoint "$UM_CKPT" --dataset "$UM_DATA" \
  --env PointMaze_UMaze-v3 --policy-type dynamics-aware --n-candidates 8 \
  --warm-start-t 40 --n-episodes 50 --seed 42 --batched
# UMaze CM 1 call
python scripts/evaluate.py --checkpoint "$UM_CM" --dataset "$UM_DATA" \
  --env PointMaze_UMaze-v3 --policy-type dynamics-aware --n-candidates 8 \
  --sampler consistency --sampling-timesteps 1 --n-episodes 50 --seed 42 --batched
# Medium full chain (already measured r4: 0.50); warm K=70; CM 1 call
python scripts/evaluate.py --checkpoint "$MED_CKPT" --dataset "$MED_DATA" \
  --env PointMaze_Medium-v3 --policy-type dynamics-aware --wall-aware \
  --n-candidates 8 --warm-start-t 70 --n-episodes 50 --seed 42 --batched
python scripts/evaluate.py --checkpoint "$MED_CM" --dataset "$MED_DATA" \
  --env PointMaze_Medium-v3 --policy-type dynamics-aware --wall-aware \
  --n-candidates 8 --sampler consistency --sampling-timesteps 1 \
  --n-episodes 50 --seed 42 --batched

# 2. Latency rows: solo vs 4 concurrent clients through the micro-batcher
for CFG in "full --checkpoint $UM_CKPT" "warm --checkpoint $UM_CKPT --warm-start-t 40" "cm --checkpoint $UM_CM --sampler consistency --sampling-timesteps 1"; do
  NAME=${CFG%% *}; ARGS=${CFG#* }
  python scripts/bench_serve.py $ARGS --dataset "$UM_DATA" \
    --env PointMaze_UMaze-v3 --policy-type dynamics-aware --n-candidates 8 \
    --clients 1 --requests-per-client 8 --concurrency 4 \
    > results/serve_um_${NAME}_solo.json
  python scripts/bench_serve.py $ARGS --dataset "$UM_DATA" \
    --env PointMaze_UMaze-v3 --policy-type dynamics-aware --n-candidates 8 \
    --clients 4 --requests-per-client 8 --concurrency 4 \
    > results/serve_um_${NAME}_c4.json
done

echo SERVING_CHAIN_DONE
