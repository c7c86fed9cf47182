#!/bin/bash
# Round-5 phase 1: close the two-round-old progressive-distillation debt
# (VERDICT r5 item 1a). Serial — one TPU chip.
#  A. HalfCheetah: the r4-trained PD students (hc_r4_pd, target 10 calls)
#     evaluated at their few-call budgets vs the matched-budget teacher.
#  B. UMaze: distill the flagship both ways (PD to 1 call; CM) so the
#     1/2/4/10-call table can be measured on the canonical protocol.
set -x
cd "$(dirname "$0")/.."

HCD="npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r4b.npz"
PDD="logs/npz_data_halfcheetah_mppi.npz+npz_data_halfcheetah_engine_r4b.npz/hc_r4_pd"
T="logs/npz_data_halfcheetah_mppi.npz+npz_data_halfcheetah_engine_r4b.npz/hc_r4b/checkpoint_step_52200.orbax"

# A1. PD student (10-step) at its 10-call budget, canonical ah=16
timeout 3600 python scripts/evaluate.py --checkpoint "$PDD/round_3_steps10/checkpoint_step_10440.orbax" \
  --dataset "$HCD" --env HalfCheetah-v5 --policy-type mpc --action-horizon 16 \
  --skip-conditioned-action --sampler ddim --sampling-timesteps 10 \
  --n-episodes 30 --seed 42 --batched
# A2. same student at the r4 best cell ah=32 (teacher DDIM-10 there: -45.4)
timeout 3600 python scripts/evaluate.py --checkpoint "$PDD/round_3_steps10/checkpoint_step_10440.orbax" \
  --dataset "$HCD" --env HalfCheetah-v5 --policy-type mpc --action-horizon 32 \
  --skip-conditioned-action --sampler ddim --sampling-timesteps 10 \
  --n-episodes 30 --seed 42 --batched
# A3. teacher at the matched 10-call budget, ah=16
timeout 3600 python scripts/evaluate.py --checkpoint "$T" \
  --dataset "$HCD" --env HalfCheetah-v5 --policy-type mpc --action-horizon 16 \
  --skip-conditioned-action --sampler ddim --sampling-timesteps 10 \
  --n-episodes 30 --seed 42 --batched
# A4. PD student pushed below its distillation budget (4 calls)
timeout 3600 python scripts/evaluate.py --checkpoint "$PDD/round_3_steps10/checkpoint_step_10440.orbax" \
  --dataset "$HCD" --env HalfCheetah-v5 --policy-type mpc --action-horizon 16 \
  --skip-conditioned-action --sampler ddim --sampling-timesteps 4 \
  --n-episodes 30 --seed 42 --batched
echo PHASE1_HC_DONE

UD="npz:data/pointmaze_umaze_expert.npz"
PM="logs/npz_data_pointmaze_umaze_expert.npz/pm_r3/checkpoint_step_3900.orbax"

# B1. UMaze progressive distillation down to 1 call
#     (halving rounds 100 -> 50 -> 25 -> 12 -> 6 -> 3 -> 1)
timeout 10800 python scripts/distill.py --method progressive --checkpoint "$PM" \
  --dataset "$UD" --n-epochs 20 --target-steps 1 --run-name pm_r5_pd
# B2. UMaze consistency distillation (fresh CM student on current code)
timeout 10800 python scripts/distill.py --checkpoint "$PM" \
  --dataset "$UD" --n-epochs 40 --run-name pm_r5_cm
echo PHASE1_ALL_DONE
