#!/usr/bin/env bash
# GA fine-tuning leg of the headline result (runs on the TPU chip).
#
# Starts from the imitation-pretrained checkpoint (scripts/run_headline_iso.sh
# produces it), so generation 0 is already ~Lloyd parity and elitism makes the
# train loss monotone non-increasing: any accepted mutation pushes the learned
# pipeline strictly below the Lloyd baseline.  Mirrors the reference's
# utils/train_dataset.py GA but with the whole population's fitness batched
# into one XLA program per shape bucket.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA=${DATA:-data_out/2d_iso}
START=${START:-runs_iso_grad/pretrain.ckpt}
OUT=${OUT:-runs_iso_ga}
GENS=${GENS:-60}

python -m mlamg_tpu.cli.train_dataset "$DATA" \
  --max-generations "$GENS" --population-size 24 \
  --start-model "$START" --bucket-step 128 \
  --init-perturb 0.05 --mutation-perturb 0.08 --adaptive-sigma true \
  --test-loss-every 5 --checkpoint-every 5 \
  --checkpoint-dir "$OUT/ckpt" --metrics-dir "$OUT/runs" "$@"
