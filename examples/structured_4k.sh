#!/bin/bash
# 4K memory-stress drive on one real chip (VERDICT r4 #3): a few hundred
# iterations of the structured raytraced scene at the reference's 4K
# Mip360 shape (~5187x3361, README.md:366-371 — its memory headline; tile-
# aligned here to 5184x3360), densification on, capacity tuner live,
# --check_gpu_memory logging HBM reserve against the ceiling derived from
# XLA memory analysis. 12 cameras keep the 4K raytrace tractable (~17M
# rays/view); the point is the per-step tensor shapes, the HBM ceiling,
# and whether the densify memory guard trips — not reconstruction quality.
set -e
ITERS=${ITERS:-300}
python scripts/train.py --synthetic_structured --synthetic_size 5184x3360 \
  --synthetic_cams 12 --synthetic_points 200000 \
  --iterations "$ITERS" --bsz 1 --seed 4 --llffhold 8 \
  --densify_from_iter 100 --densification_interval 100 \
  --densify_until_iter "$ITERS" \
  --test_iterations "$ITERS" --save_iterations "$ITERS" \
  --check_gpu_memory --log_memory_summary --log_interval 50 \
  --model_path output/structured4k
