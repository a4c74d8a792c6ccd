#!/usr/bin/env bash
# Regenerate the round-5 2D aniso full-ML checkpoint (recipe recorded in
# results/aniso_full_ml_r5_summary.json): rel-strength gradient training,
# pretrain + 400 steps (tau 0.08->0.02) + 600 resumed steps (tau 0.02->0.006).
# PLATFORM=cpu forces CPU; default uses the session's default backend (TPU).
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=data_out/2d_aniso
PLATFORM=${PLATFORM:-}
PLAT_FLAG=${PLATFORM:+--platform $PLATFORM}
if [ ! -d "$DATA/train" ]; then
  python -m mlamg_tpu.cli.create_data "$DATA" --n-grids 50 --type anisotropic \
    --dof-min 64 --dof-max 250 --split 0.2 --seed 11
fi
if [ ! -f runs_aniso_r5/pretrain.ckpt ]; then
python -m mlamg_tpu.cli.pretrain_dataset "$DATA" --epochs 60 \
  --platform cpu --rel-strength true --out runs_aniso_r5/pretrain.ckpt
fi
python -m mlamg_tpu.cli.train_gradient "$DATA" --steps 400 \
  $PLAT_FLAG --bucket-step 128 --eval-every 20 --checkpoint-every 40 \
  --rel-strength true --tau-final 0.02 \
  --start-model runs_aniso_r5/pretrain.ckpt --out runs_aniso_r5
python -m mlamg_tpu.cli.train_gradient "$DATA" --steps 600 \
  $PLAT_FLAG --bucket-step 128 --eval-every 20 --checkpoint-every 40 \
  --rel-strength true --tau-assign 0.02 --tau-final 0.006 \
  --start-model runs_aniso_r5/grad_best.ckpt --out runs_aniso_r5_b
for split in train test; do
  python -m mlamg_tpu.cli.evaluate_dataset "$DATA/$split" \
    --model runs_aniso_r5_b/grad_best.ckpt --platform cpu --ablations true \
    --out "results/eval_2d_aniso_${split}_r5"
done
