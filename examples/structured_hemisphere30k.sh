#!/bin/bash
# Structured quality protocol on one real TPU chip (round-4): the raytraced
# hemisphere scene (textured ground + spheres, lambertian + shadows) at the
# Mip360-garden images_4 shape, 72 cameras on three interleaved elevation
# rings, every 8th held out (the reference's llffhold split) — through the
# FULL reference schedule: 30k iterations, densification 500..15000/100,
# opacity resets every 3000. Unlike the old clutter protocol, held-out PSNR
# here is meaningful reconstruction evidence (tests/test_structured_scene.py
# pins why). Offline render + metrics drive the saved model end to end.
#
# Checkpoints are dense (every ~3k iters ~= 30 min of wall clock) and
# --auto_start_checkpoint resumes from the newest one, so a killed session
# costs at most one checkpoint interval: the round-4 attempt died at iter
# 11,278 with its only checkpoint scheduled at 15,000 and lost everything
# past the logs (examples/logs/structured30k_r4_partial.log — which still
# recorded held-out PSNR 25.54 vs train 25.91 at iter 7000). Re-running
# this script after a crash continues instead of restarting.
set -e
python scripts/train.py --synthetic_structured --synthetic_size 1280x832 \
  --synthetic_cams 72 --synthetic_points 100000 \
  --iterations 30000 --bsz 1 --seed 4 --llffhold 8 \
  --test_iterations 3000 7000 11000 15000 20000 25000 30000 \
  --save_iterations 30000 \
  --checkpoint_iterations 3000 6000 9000 12000 15000 18000 19000 20000 \
    21000 22000 23000 24000 25000 26000 27000 28000 29000 \
  --auto_start_checkpoint --log_interval 500 \
  --model_path output/structured30k
python scripts/render.py -m output/structured30k --skip_train
python scripts/metrics.py -m output/structured30k
