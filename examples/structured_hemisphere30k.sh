#!/bin/bash
# Structured quality protocol on one real TPU chip (round-4): the raytraced
# hemisphere scene (textured ground + spheres, lambertian + shadows) at the
# Mip360-garden images_4 shape, 72 cameras on three interleaved elevation
# rings, every 8th held out (the reference's llffhold split) — through the
# FULL reference schedule: 30k iterations, densification 500..15000/100,
# opacity resets every 3000. Unlike the old clutter protocol, held-out PSNR
# here is meaningful reconstruction evidence (tests/test_structured_scene.py
# pins why). Offline render + metrics drive the saved model end to end.
set -e
python scripts/train.py --synthetic_structured --synthetic_size 1280x832 \
  --synthetic_cams 72 --synthetic_points 100000 \
  --iterations 30000 --bsz 1 --seed 4 --llffhold 8 \
  --test_iterations 7000 15000 30000 --save_iterations 30000 \
  --checkpoint_iterations 15000 --log_interval 500 \
  --model_path output/structured30k
python scripts/render.py -m output/structured30k --skip_train
python scripts/metrics.py -m output/structured30k
