#!/usr/bin/env bash
# 3D Laplace legs of the headline table (tex/6_1_22.tex:135-139; reference
# data recipe utils/create_3d_laplace.py:81-94).  Two families:
#   iso:   K = I, per-axis interior dofs 7..13  (BASELINE rows 7-8)
#   aniso: K = R^T diag(eps_x, eps_y, 1) R, eps ~ 10^U(-4,4) (rows 9-10)
# Pipeline per family: create data -> imitation pretrain -> soft-pipeline
# gradient training -> discrete evaluation vs Lloyd/random baselines.
#   FAMILY=3d        ./scripts/run_headline_3d.sh   (default)
#   FAMILY=3d_aniso  ./scripts/run_headline_3d.sh
set -euo pipefail
cd "$(dirname "$0")/.."

FAMILY=${FAMILY:-3d}
case "$FAMILY" in
  3d)       DATA=${DATA:-data_out/3d_iso};   OUT=${OUT:-runs_3d_iso};   SEED=21 ;;
  3d_aniso) DATA=${DATA:-data_out/3d_aniso}; OUT=${OUT:-runs_3d_aniso}; SEED=22 ;;
  *) echo "FAMILY must be 3d or 3d_aniso" >&2; exit 1 ;;
esac
STEPS=${STEPS:-400}

if [ ! -d "$DATA/train" ]; then
  python -m mlamg_tpu.cli.create_data "$DATA" --n-grids 40 --type "$FAMILY" \
    --split 0.25 --seed "$SEED"
fi

python -m mlamg_tpu.cli.pretrain_dataset "$DATA" --epochs 60 \
  --platform cpu --out "$OUT/pretrain.ckpt"

python -m mlamg_tpu.cli.train_gradient "$DATA" --steps "$STEPS" \
  --platform cpu --bucket-step 512 --grid-chunk 8 \
  --eval-every 20 --checkpoint-every 40 \
  --start-model "$OUT/pretrain.ckpt" --out "$OUT"

for split in train test; do
  python -m mlamg_tpu.cli.evaluate_dataset "$DATA/$split" \
    --model "$OUT/grad_best.ckpt" --platform cpu --ablations true \
    --out "$OUT/eval_$split"
done
