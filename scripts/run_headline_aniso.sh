#!/usr/bin/env bash
# Anisotropic-diffusion leg of the headline table (tex/6_1_22.tex:115-116).
# Same pipeline as run_headline_iso.sh on random-rotation anisotropic
# unstructured FEM grids (eps drawn log-uniform from [1e-4, 1]).
set -euo pipefail
cd "$(dirname "$0")/.."

DATA=${DATA:-data_out/2d_aniso}
OUT=${OUT:-runs_aniso_grad}
STEPS=${STEPS:-400}

if [ ! -d "$DATA/train" ]; then
  python -m mlamg_tpu.cli.create_data "$DATA" --n-grids 50 --type anisotropic \
    --dof-min 64 --dof-max 250 --split 0.2 --seed 11
fi

python -m mlamg_tpu.cli.pretrain_dataset "$DATA" --epochs 60 \
  --platform cpu --out "$OUT/pretrain.ckpt"

python -m mlamg_tpu.cli.train_gradient "$DATA" --steps "$STEPS" \
  --platform cpu --bucket-step 128 --eval-every 20 --checkpoint-every 40 \
  --start-model "$OUT/pretrain.ckpt" --out "$OUT"

for split in train test; do
  python -m mlamg_tpu.cli.evaluate_dataset "$DATA/$split" \
    --model "$OUT/grad_best.ckpt" --platform cpu --ablations true \
    --out "$OUT/eval_$split"
done
