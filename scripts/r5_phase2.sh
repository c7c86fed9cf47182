#!/bin/bash
# Round-5 phase 2: the gait-smoothness lever on the exact-physics MPPI data
# engine (VERDICT r5 item 2). Smoothed search + smoothed exploration noise,
# 200 HalfCheetah episodes on exact dynamics, retrain the mppi+engine mix,
# evaluate MPC ah=16/32 at n=30. Serial — one chip.
set -x
cd "$(dirname "$0")/.."

# 0. The quick headline-debt items first (formerly r5_phase4.sh: replication
#    of the r4 best cell on fresh seeds + artifact re-emission of the r4
#    on-device headline runs) so they land even if the round runs out of
#    wall-clock mid-phase.
bash scripts/r5_phase4.sh
echo PHASE2_QUICK_DONE

# 1. Smoothed physics-engine collection (r4 run minus jerk: AR(1) search
#    noise beta=0.85, jerk penalty 0.02, colored execution noise)
timeout 14400 python scripts/collect_mppi_tpu.py --env HalfCheetah-v5 --backend physics \
  --seed-data npz:data/halfcheetah_mppi.npz \
  --episodes 200 --batch-envs 16 --max-steps 600 \
  --horizon 12 --n-samples 512 --n-exec 4 --physics-solver-iters 100 \
  --noise-beta 0.85 --smooth-weight 0.02 \
  --explore-sigma 0.15 --explore-beta 0.8 --iterations 1 --seed 11 \
  --out data/halfcheetah_engine_r5s.npz
echo PHASE2_COLLECT_DONE

# 2. Retrain the flagship recipe on the smoothed-engine mix
timeout 14400 python scripts/train.py \
  --dataset "npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r5s.npz" \
  --horizon 32 --dim 128 --dim-mults 1 4 8 --n-timesteps 100 \
  --n-epochs 60 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name hc_r5s --seed 42
echo PHASE2_TRAIN_DONE

CKPT=$(ls -d "logs/npz_data_halfcheetah_mppi.npz+npz_data_halfcheetah_engine_r5s.npz/hc_r5s"/checkpoint_step_*.orbax | sort -t_ -k3 -n | tail -1)
DATA="npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r5s.npz"

# 3. MPC eval at the canonical and best-swept chunk lengths, n=30
for AH in 16 32; do
  timeout 3600 python scripts/evaluate.py --checkpoint "$CKPT" --dataset "$DATA" \
    --env HalfCheetah-v5 --policy-type mpc --action-horizon $AH \
    --skip-conditioned-action --n-episodes 30 --seed 42 --batched
done
echo PHASE2_ALL_DONE
