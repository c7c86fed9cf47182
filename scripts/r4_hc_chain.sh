#!/bin/bash
# Round-4 HalfCheetah program: true-physics engine data -> retrained
# flagship -> the full open-measurement battery (VERDICT r4 items 1, 2, 4).
# Serial (one TPU chip). Run pieces individually or the whole chain.
set -x
cd "$(dirname "$0")/.."

# 1. Engine data: MPPI on EXACT physics (no learned-sim ceiling)
python scripts/collect_mppi_tpu.py --env HalfCheetah-v5 --backend physics \
  --seed-data npz:data/halfcheetah_mppi.npz \
  --episodes 200 --batch-envs 16 --max-steps 1000 \
  --horizon 12 --n-samples 512 --n-exec 4 --physics-solver-iters 100 \
  --explore-sigma 0.15 --iterations 1 --seed 7 \
  --out data/halfcheetah_engine_r4.npz && touch /tmp/done_hc_collect

# 2. Flagship retrain on the r2d-style mix (host expert + physics engine;
#    dagger_agg deliberately excluded: its 2000x48-step segments swamped the
#    r3 mix and sank hc_r3 to -4.5)
python scripts/train.py \
  --dataset "npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r4.npz" \
  --horizon 32 --dim 128 --dim-mults 1 4 8 --n-timesteps 100 \
  --n-epochs 60 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name hc_r4 --seed 42 && touch /tmp/done_hc_train

CKPT=$(ls -t logs/*/hc_r4/checkpoint_step_*.orbax -d | head -1)
DATA="npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r4.npz"

# 3. Headline at n=30 (statistical power, VERDICT #6)
python scripts/evaluate.py --checkpoint "$CKPT" --dataset "$DATA" \
  --env HalfCheetah-v5 --policy-type mpc --action-horizon 16 \
  --skip-conditioned-action --n-episodes 30 --seed 42 --batched

# 4. Execution-gap lever sweep (VERDICT #2): action-source x ah, n=30
for AH in 8 16 32; do
  for SRC in plan inverse-dynamics track; do
    python scripts/evaluate.py --checkpoint "$CKPT" --dataset "$DATA" \
      --env HalfCheetah-v5 --policy-type mpc --action-horizon $AH \
      --action-source $SRC --skip-conditioned-action \
      --n-episodes 30 --seed 42 --batched
  done
done

# 5. Deviation replanning arm (sequential protocol) on the best cell
python scripts/evaluate.py --checkpoint "$CKPT" --dataset "$DATA" \
  --env HalfCheetah-v5 --policy-type mpc --action-horizon 16 \
  --skip-conditioned-action --replan-deviation 1.0 --n-episodes 30 --seed 42

# 6. Progressive distillation (r2 #3): <=10-call planner
python scripts/distill.py --method progressive --checkpoint "$CKPT" \
  --dataset "$DATA" --n-epochs 40 --run-name hc_r4_pd
# then evaluate the PD student at its few-call budget (see distill.py docs)

# 7. On-device TRUE-PHYSICS eval A/B vs the host number from step 3
#    (--solver jacobi: the solver that produced the documented r4 number;
#     the K* bound itself was measured with the default PGS — RESULTS.md)
python scripts/eval_ondevice_locomotion.py --checkpoint "$CKPT" \
  --dataset "$DATA" --env HalfCheetah-v5 --backend physics --solver jacobi \
  --batch 30 --n-replans 62 --action-horizon 16 --skip-conditioned-action \
  --seed 42

echo CHAIN_DONE
