#!/bin/bash
# Round-3 checkpoint regeneration chain (serial: one TPU chip).
# Recipes match RESULTS.md's committed provenance lines.
set -x
cd "$(dirname "$0")/.."

# 1. HalfCheetah flagship: 230-episode mix (30 host MPPI + 200 engine), 60 ep
python scripts/train.py \
  --dataset "npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r3.npz" \
  --horizon 32 --dim 128 --dim-mults 1 4 8 --n-timesteps 100 \
  --n-epochs 60 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name hc_r3 --seed 42

# 2. UMaze flagship (canonical README recipe)
python scripts/train.py \
  --dataset npz:data/pointmaze_umaze_expert.npz \
  --horizon 32 --dim 128 --dim-mults 1 2 4 --n-timesteps 100 \
  --n-epochs 100 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name pm_r3 --seed 42

# 3. Medium flagship (committed 400-episode expert set)
python scripts/train.py \
  --dataset npz:data/pointmaze_medium_expert400.npz \
  --horizon 32 --dim 128 --dim-mults 1 2 4 --n-timesteps 100 \
  --n-epochs 100 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name pm_med_r3 --seed 42

# 4. TemporalTransformer on Medium (VERDICT r3 #7)
python scripts/train.py \
  --dataset npz:data/pointmaze_medium_expert400.npz \
  --model-type transformer --dim 256 --depth 6 --n-heads 8 \
  --horizon 32 --n-timesteps 100 \
  --n-epochs 100 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name tt_med_r3 --seed 42

# 5. TemporalTransformer on HalfCheetah (VERDICT r3 #7)
python scripts/train.py \
  --dataset "npz:data/halfcheetah_mppi.npz+npz:data/halfcheetah_engine_r3.npz" \
  --model-type transformer --dim 256 --depth 6 --n-heads 8 \
  --horizon 32 --n-timesteps 100 \
  --n-epochs 60 --batch-size 256 --lr 2e-4 \
  --log-dir logs --run-name tt_hc_r3 --seed 42

echo CHAIN_DONE
