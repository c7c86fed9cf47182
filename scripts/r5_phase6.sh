#!/bin/bash
# Round-5 phase 6 (time-permitting): the return-level lever on the
# exact-physics engine — the separator the r5 smoothness falsification
# identified (RESULTS.md [r5]). Matches the learned-sim engine's search
# power (N=1024, up from the r4 physics run's 512; search model unchanged —
# its ranking fidelity was validated in r4), then retrains the flagship
# mix and evaluates at n=30. iterations=4 gives 50-episode checkpoints.
set -x
cd "$(dirname "$0")/.."

# batch-envs 8 keeps the compiled search at N x B = 8192 candidate-env
# lanes — the same program scale the r4 512x16 run compiled in minutes;
# 1024x16 = 16384 lanes sat in the remote compiler for 40+ min (measured
# r5) without returning. iterations 8 -> 25-episode checkpoints.
timeout 10800 python scripts/collect_mppi_tpu.py --env HalfCheetah-v5 --backend physics \
  --seed-data npz:data/halfcheetah_mppi.npz \
  --episodes 200 --batch-envs 8 --max-steps 600 \
  --horizon 12 --n-samples 1024 --n-exec 4 --physics-solver-iters 100 \
  --explore-sigma 0.15 --iterations 8 --seed 13 \
  --out data/halfcheetah_engine_r5p.npz
echo PHASE6_COLLECT_DONE

timeout 14400 python scripts/train.py \
  --dataset "npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r5p.npz" \
  --horizon 32 --dim 128 --dim-mults 1 4 8 --n-timesteps 100 \
  --n-epochs 60 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name hc_r5p --seed 42
echo PHASE6_TRAIN_DONE

CKPT=$(ls -d "logs/npz_data_halfcheetah_mppi.npz+npz_data_halfcheetah_engine_r5p.npz/hc_r5p"/checkpoint_step_*.orbax | sort -t_ -k3 -n | tail -1)
DATA="npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r5p.npz"
timeout 3600 python scripts/evaluate.py --checkpoint "$CKPT" --dataset "$DATA" \
  --env HalfCheetah-v5 --policy-type mpc --action-horizon 16 \
  --skip-conditioned-action --n-episodes 30 --seed 42 --batched
echo PHASE6_ALL_DONE
