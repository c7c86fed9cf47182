#!/bin/bash
# Round-3 session chain: regeneration order prioritised by open VERDICT items.
# Serial (one TPU chip). Each run ~6-8 min steady-state + first-compile cost.
set -x
cd "$(dirname "$0")/.."

# 1. HalfCheetah flagship (needed for --action-source track eval + distill)
python scripts/train.py \
  --dataset "npz:data/halfcheetah_mppi.npz+npz:data/hc_dagger_agg.npz" \
  --horizon 32 --dim 128 --dim-mults 1 4 8 --n-timesteps 100 \
  --n-epochs 60 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name hc_r3 --seed 42 && touch /tmp/done_hc

# 2. Medium flagship (VERDICT #4 matched-budget A/B)
python scripts/train.py \
  --dataset npz:data/pointmaze_medium_expert400.npz \
  --horizon 32 --dim 128 --dim-mults 1 2 4 --n-timesteps 100 \
  --n-epochs 100 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name pm_med_r3 --seed 42 && touch /tmp/done_med

# 3. TemporalTransformer on Medium (VERDICT #7)
python scripts/train.py \
  --dataset npz:data/pointmaze_medium_expert400.npz \
  --model-type transformer --dim 256 --depth 6 --n-heads 8 \
  --horizon 32 --n-timesteps 100 \
  --n-epochs 100 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name tt_med_r3 --seed 42 && touch /tmp/done_ttmed

# 4. TemporalTransformer on HalfCheetah (VERDICT #7)
python scripts/train.py \
  --dataset "npz:data/halfcheetah_mppi.npz+npz:data/hc_dagger_agg.npz" \
  --model-type transformer --dim 256 --depth 6 --n-heads 8 \
  --horizon 32 --n-timesteps 100 \
  --n-epochs 60 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name tt_hc_r3 --seed 42 && touch /tmp/done_tthc

# 5. UMaze flagship
python scripts/train.py \
  --dataset npz:data/pointmaze_umaze_expert.npz \
  --horizon 32 --dim 128 --dim-mults 1 2 4 --n-timesteps 100 \
  --n-epochs 100 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name pm_r3 --seed 42 && touch /tmp/done_pm

echo CHAIN_DONE
