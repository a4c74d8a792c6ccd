#!/usr/bin/env bash
# Reproduce the headline result: learned FullAggNet beating the Lloyd+SA
# baseline convergence factor on held-out 2D isotropic unstructured FEM
# grids (the reference's flagship table, tex/6_1_22.tex:113-116).
#
# Pipeline: create data -> imitation pretrain (Adam, differentiable heads)
# -> soft-pipeline gradient training (Adam through the differentiable
# two-level conv factor) -> discrete evaluation vs Lloyd/random baselines.
#
# Runs entirely on CPU (no TPU required); ~30-45 min on 2 cores.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA=${DATA:-data_out/2d_iso}
OUT=${OUT:-runs_iso_grad}
STEPS=${STEPS:-400}

if [ ! -d "$DATA/train" ]; then
  python -m mlamg_tpu.cli.create_data "$DATA" --n-grids 50 --type isotropic \
    --dof-min 64 --dof-max 250 --split 0.2 --seed 7
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
