#!/bin/bash
# Round-5 phase 3: Hopper and Walker2d join the quotable on-device loop
# (VERDICT r5 item 3). Regenerates the r2 engine recipe hermetically from
# committed seeds, retrains both flagships, measures host vs on-device
# exact-physics returns at n=30 on the SAME checkpoints, and re-measures
# both K* bounds on >50 long segments. Ordered Hopper-complete-first so a
# wall-clock cutoff still leaves one env fully measured; the CPU-only
# physics_bound runs go in the background off the chip's critical path.
set -x
cd "$(dirname "$0")/.."

run_env () {  # $1 short name, $2 env id, $3 run name, $4 n-replans
  N=$1; ENV=$2; RUN=$3; NREP=$4
  timeout 7200 python scripts/collect_mppi_tpu.py --env $ENV \
    --seed-data npz:data/${N}_mppi.npz npz:data/${N}_random.npz \
    --episodes 200 --batch-envs 16 --horizon 12 --n-samples 1024 \
    --n-exec 4 --iterations 8 --sim-steps 12000 --sim-hidden 512 512 \
    --sim-ensemble 4 --explore-sigma 0.15 --seed 5 \
    --out data/${N}_engine_r5.npz
  # K* bound re-measurement on the fresh long-segment pool runs on CPU,
  # concurrently with the chip jobs below (VERDICT r4 weak #4)
  ( timeout 10800 python scripts/physics_bound.py --env $ENV \
      --data npz:data/${N}_mppi.npz npz:data/${N}_engine_r5.npz \
      --k 1 2 4 8 16 32 64 128 --max-segments 512 --device cpu \
      --out results/physics_bound_${ENV//-/_}_float32.json \
      > /tmp/r5_bound_${N}.log 2>&1 ) &

  timeout 14400 python scripts/train.py \
    --dataset "npz:data/${N}_mppi.npz+npz:data/${N}_engine_r5.npz" \
    --horizon 32 --dim 128 --dim-mults 1 4 8 --n-timesteps 100 \
    --n-epochs 60 --batch-size 256 --lr 2e-4 \
    --log-dir logs --run-name $RUN --seed 42

  CKPT=$(ls -d "logs/npz_data_${N}_mppi.npz+npz_data_${N}_engine_r5.npz/$RUN"/checkpoint_step_*.orbax | sort -t_ -k3 -n | tail -1)
  DATA="npz:data/${N}_mppi.npz+npz:data/${N}_engine_r5.npz"

  # host protocol (ground truth), ah=1 (the balance-task best), n=30
  timeout 7200 python scripts/evaluate.py --checkpoint "$CKPT" --dataset "$DATA" \
    --env $ENV --policy-type mpc --action-horizon 1 \
    --skip-conditioned-action --n-episodes 30 --seed 42 --batched

  # wait for the fresh K* bound before the guarded on-device run
  wait
  timeout 7200 python scripts/eval_ondevice_locomotion.py --checkpoint "$CKPT" \
    --dataset "$DATA" --env $ENV --backend physics --solver jacobi \
    --batch 30 --n-replans 992 --action-horizon 1 --skip-conditioned-action \
    --seed 42
  echo PHASE3_${RUN}_DONE
}

run_env hopper Hopper-v5 hop_r5 992
run_env walker2d Walker2d-v5 wlk_r5 992
echo PHASE3_ALL_DONE
