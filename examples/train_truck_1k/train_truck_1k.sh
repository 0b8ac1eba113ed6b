#!/bin/bash
# Tanks&Temples train/truck at 1K, bsz=8 (reference counterpart:
# examples/train_truck_1k/train_truck_1k.sh).
set -e
DATA=${1:?dataset root containing train/ truck/}
OUT=${2:-output/tnt}
for SCENE in train truck; do
  python scripts/train.py \
    -s "$DATA/$SCENE" -m "$OUT/${SCENE}_1k_8b" \
    --eval --llffhold 8 --iterations 30000 --bsz 8 \
    --test_iterations 7000 30000 --save_iterations 7000 30000
  python scripts/render.py -m "$OUT/${SCENE}_1k_8b" --skip_train
  python scripts/metrics.py -m "$OUT/${SCENE}_1k_8b"
done
