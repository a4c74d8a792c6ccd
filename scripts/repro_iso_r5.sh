#!/usr/bin/env bash
# Regenerate the round-5 2D iso headline checkpoint (the recipe recorded in
# results/iso_full_ml_r5_summary.json): rel-strength + weight-noise(0.01)
# full-ML gradient training, pretrain + 600 Adam steps, tau 0.08->0.015.
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=data_out/2d_iso
OUT=runs_iso_r5
if [ ! -d "$DATA/train" ]; then
  python -m mlamg_tpu.cli.create_data "$DATA" --n-grids 50 --type isotropic \
    --dof-min 64 --dof-max 250 --split 0.2 --seed 7
fi
if [ ! -f $OUT/pretrain.ckpt ]; then
python -m mlamg_tpu.cli.pretrain_dataset "$DATA" --epochs 60 \
  --platform cpu --rel-strength true --out "$OUT/pretrain.ckpt"
fi
python -m mlamg_tpu.cli.train_gradient "$DATA" --steps 600 \
  --platform cpu --bucket-step 128 --eval-every 20 --checkpoint-every 40 \
  --rel-strength true --weight-noise 0.01 --tau-final 0.015 \
  --start-model "$OUT/pretrain.ckpt" --out "$OUT"
for split in train test; do
  python -m mlamg_tpu.cli.evaluate_dataset "$DATA/$split" \
    --model "$OUT/grad_best.ckpt" --platform cpu --ablations true \
    --out "results/eval_2d_iso_${split}_rel"
done
