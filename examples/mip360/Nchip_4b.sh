#!/bin/bash
# Mip360 multi-chip bsz=4 training (reference counterpart: 4g_4b.sh).
# Usage: bash examples/mip360/Nchip_4b.sh <dataset_root> <scene> <out_root>
set -e
DATA=${1:?dataset root}
SCENE=${2:?scene name}
OUT=${3:-output/mip360}
case "$SCENE" in
  bicycle|garden|stump) IMAGES=images_4 ;;
  *) IMAGES=images_2 ;;
esac
python scripts/train.py \
  -s "$DATA/$SCENE" -m "$OUT/${SCENE}_Nchip_4b" -i "$IMAGES" \
  --eval --llffhold 8 --iterations 30000 --bsz 4 \
  --test_iterations 7000 15000 30000 \
  --save_iterations 7000 30000
