#!/bin/bash
# Garden-scale endurance protocol on one real TPU chip: ~150k Gaussians at
# 1280x832 (Mip360-garden images_4 shape) through the full reference
# schedule — densification 500..12000, opacity resets every 3000, eval,
# per-shard checkpoint + PLY save — with the capacity auto-tuner live
# (startup-transient grow/shrink, reset-cycle retunes). The synthetic GT
# keeps the run hermetic (no datasets in this environment); the round-3
# numbers from this protocol are recorded in ROUND3_NOTES.md.
set -e
python scripts/train.py --synthetic --synthetic_size 1280x832 \
  --synthetic_gaussians 150000 --synthetic_points 120000 \
  --iterations 15000 --bsz 1 --seed 9 \
  --densify_until_iter 12000 --opacity_reset_interval 3000 \
  --test_iterations 7000 15000 --save_iterations 15000 \
  --checkpoint_iterations 7500 --log_interval 500 \
  --model_path output/synthetic_garden15k
python scripts/render.py -m output/synthetic_garden15k --skip_train
python scripts/metrics.py -m output/synthetic_garden15k
