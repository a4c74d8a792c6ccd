#!/usr/bin/env bash
# 3D aniso full-ML attempt with the round-5 2D winners' levers:
# rel-strength edge feature + parameter-noise training + deep tau anneal.
# (Previous 3D aniso runs without weight-noise stalled at ratio ~1.10-1.12
# with a large soft/discrete gap — exactly the sharp-minima signature that
# weight-noise fixed on 2D iso.)
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=data_out/3d_aniso
OUT=runs_3d_aniso_wn
STEPS=${STEPS:-300}
PLATFORM=${PLATFORM:-}
PLAT_FLAG=${PLATFORM:+--platform $PLATFORM}
if [ ! -d "$DATA/train" ]; then
  python -m mlamg_tpu.cli.create_data "$DATA" --n-grids 40 --type 3d_aniso \
    --split 0.25 --seed 22
fi
if [ ! -f $OUT/pretrain.ckpt ]; then
python -m mlamg_tpu.cli.pretrain_dataset "$DATA" --epochs 60 \
  --platform cpu --rel-strength true --out "$OUT/pretrain.ckpt"
fi
python -m mlamg_tpu.cli.train_gradient "$DATA" --steps "$STEPS" \
  $PLAT_FLAG --bucket-step 512 --grid-chunk 8 \
  --eval-every 20 --checkpoint-every 40 \
  --rel-strength true --weight-noise 0.01 --tau-final 0.01 \
  --start-model "$OUT/pretrain.ckpt" --out "$OUT"
for split in train test; do
  python -m mlamg_tpu.cli.evaluate_dataset "$DATA/$split" \
    --model "$OUT/grad_best.ckpt" --platform cpu --ablations true \
    --out "results/eval_3d_aniso_${split}_wn"
done
