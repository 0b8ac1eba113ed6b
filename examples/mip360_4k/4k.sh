#!/bin/bash
# Mip360 4K (full-res bicycle/garden), 50k iters with the 4K densification
# settings (reference counterpart: examples/mip360_4k/*_4k.sh).
set -e
DATA=${1:?dataset root}
SCENE=${2:?bicycle|garden}
OUT=${3:-output/mip360_4k}
python scripts/train.py \
  -s "$DATA/$SCENE" -m "$OUT/${SCENE}_4k" -i images \
  --eval --llffhold 8 --iterations 50000 --bsz 1 \
  --densify_grad_threshold 0.0001 --percent_dense 0.002 \
  --densify_until_iter 25000 \
  --test_iterations 7000 30000 50000 --save_iterations 50000
