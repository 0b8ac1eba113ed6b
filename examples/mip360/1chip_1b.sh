#!/bin/bash
# Mip360 single-chip bsz=1 training (reference counterpart:
# /root/reference/examples/mip360/1g_1b.sh — 30k iters, --eval, llffhold 8,
# images_4 for outdoor scenes / images_2 for indoor).
# Usage: bash examples/mip360/1chip_1b.sh <dataset_root> <scene> <out_root>
set -e
DATA=${1:?dataset root}
SCENE=${2:?scene name}
OUT=${3:-output/mip360}
case "$SCENE" in
  bicycle|garden|stump) IMAGES=images_4 ;;
  *) IMAGES=images_2 ;;
esac
python scripts/train.py \
  -s "$DATA/$SCENE" -m "$OUT/${SCENE}_1chip_1b" -i "$IMAGES" \
  --eval --llffhold 8 --iterations 30000 --bsz 1 \
  --test_iterations 7000 15000 30000 \
  --save_iterations 7000 30000 \
  --n_devices 1
