#!/bin/bash
# End-to-end smoke on the generated synthetic scene (CPU mesh or TPU).
set -e
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python scripts/train.py --platform cpu --synthetic --iterations 300 --bsz 2 \
  --densify_from_iter 50 --densification_interval 60 --densify_until_iter 250 \
  --opacity_reset_interval 150 --test_iterations 300 --save_iterations 300 \
  --log_interval 50 --model_path output/synthetic_smoke
