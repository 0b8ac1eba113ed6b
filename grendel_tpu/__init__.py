"""grendel_tpu — a TPU-native distributed 3D Gaussian Splatting training framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
nyu-systems/Grendel-GS (see SURVEY.md): tile-based differentiable
rasterization, hybrid Gaussian-parallel + pixel-parallel training over a
device mesh, batched multi-view training with batch-size LR scaling,
densification/pruning on padded-capacity state, and elastic sharded
checkpoints.

Layout:
  ops/       projection, SH, tile intersection, rasterization (JAX + Pallas), SSIM, KNN
  models/    GaussianModel pytree, optimizer (sparse Adam + LR schedules), densification
  parallel/  device mesh, Gaussian/pixel sharding, all-to-all, load balancing
  data/      COLMAP/Blender readers, camera dataset
  engine/    render pipeline, loss, train step, checkpointing
  utils/     math3d, config, timers, logging
"""

__version__ = "0.1.0"
