#!/usr/bin/env bash
# Regenerate the round-5 3D iso checkpoint (results/summary_3d.json):
# pretrain + soft-pipeline gradient training on tet-FEM grids, 400 steps
# total with tau 0.08->0.015.
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=data_out/3d_iso
PLATFORM=${PLATFORM:-}
PLAT_FLAG=${PLATFORM:+--platform $PLATFORM}
if [ ! -d "$DATA/train" ]; then
  python -m mlamg_tpu.cli.create_data "$DATA" --n-grids 40 --type 3d \
    --split 0.25 --seed 21
fi
if [ ! -f runs_3d_iso_r5/pretrain.ckpt ]; then
python -m mlamg_tpu.cli.pretrain_dataset "$DATA" --epochs 60 \
  --platform cpu --out runs_3d_iso_r5/pretrain.ckpt
fi
python -m mlamg_tpu.cli.train_gradient "$DATA" --steps 400 \
  $PLAT_FLAG --bucket-step 512 --grid-chunk 8 \
  --eval-every 20 --checkpoint-every 40 --tau-final 0.015 \
  --start-model runs_3d_iso_r5/pretrain.ckpt --out runs_3d_iso_r5
for split in train test; do
  python -m mlamg_tpu.cli.evaluate_dataset "$DATA/$split" \
    --model runs_3d_iso_r5/grad_best.ckpt --platform cpu --ablations true \
    --out "results/eval_3d_iso_${split}_grad"
done
