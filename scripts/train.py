#!/usr/bin/env python
"""Training CLI — the TPU counterpart of the reference's train.py.

Flag names mirror /root/reference/arguments/__init__.py param groups so a
Grendel-GS user can bring their command lines over. Run from the repo root
(or with PYTHONPATH=<repo>):

  python scripts/train.py -s <scene_dir> -m out/run1 --eval --bsz 4
  python scripts/train.py --synthetic --iterations 300   # smoke test
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native 3DGS training")
    # ModelParams
    p.add_argument("--source_path", "-s", type=str, default="")
    p.add_argument("--model_path", "-m", type=str, default="")
    p.add_argument("--images", "-i", type=str, default="images")
    p.add_argument("--resolution", "-r", type=float, default=-1,
                   help="GT downscale: 1/2/4/8 divider, -1 auto "
                        "(cap width at 1600), other = target width")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--llffhold", type=int, default=8)
    # OptimizationParams
    p.add_argument("--iterations", type=int, default=30_000)
    p.add_argument("--position_lr_init", type=float, default=0.00016)
    p.add_argument("--position_lr_final", type=float, default=0.0000016)
    p.add_argument("--position_lr_delay_mult", type=float, default=0.01)
    p.add_argument("--position_lr_max_steps", type=int, default=30_000)
    p.add_argument("--feature_lr", type=float, default=0.0025)
    p.add_argument("--opacity_lr", type=float, default=0.05)
    p.add_argument("--scaling_lr", type=float, default=0.005)
    p.add_argument("--rotation_lr", type=float, default=0.001)
    p.add_argument("--lambda_dssim", type=float, default=0.2)
    p.add_argument("--percent_dense", type=float, default=0.01)
    p.add_argument("--densification_interval", type=int, default=100)
    p.add_argument("--opacity_reset_interval", type=int, default=3000)
    p.add_argument("--opacity_reset_until_iter", type=int, default=-1)
    p.add_argument("--densify_from_iter", type=int, default=500)
    p.add_argument("--densify_until_iter", type=int, default=15_000)
    p.add_argument("--densify_grad_threshold", type=float, default=0.0002)
    p.add_argument("--disable_auto_densification", action="store_true")
    p.add_argument("--min_opacity", type=float, default=0.005)
    p.add_argument("--lr_scale_mode", type=str, default="sqrt",
                   choices=["linear", "sqrt", "accumu"])
    p.add_argument("--lr_scale_loss", type=float, default=1.0)
    p.add_argument("--random_background", action="store_true")
    # DistributionParams
    p.add_argument("--bsz", type=int, default=1)
    p.add_argument("--gaussians_distribution", type=int, default=1)
    p.add_argument("--image_distribution", type=int, default=1)
    p.add_argument("--heuristic_decay", type=float, default=0.0)
    p.add_argument("--no_heuristics_update", action="store_true")
    p.add_argument("--redistribute_gaussians_mode", type=str,
                   default="random_redistribute")
    p.add_argument("--redistribute_gaussians_frequency", type=int, default=10)
    p.add_argument("--redistribute_gaussians_threshold", type=float,
                   default=1.1)
    p.add_argument("--distributed_dataset_storage", type=int, default=1)
    p.add_argument("--distributed_save", type=int, default=1)
    p.add_argument("--sync_grad_mode", type=str, default="dense",
                   choices=["dense", "sparse", "fused_dense", "fused_sparse"],
                   help="replicated-mode grad sync; all variants are one "
                        "dense psum on TPU (parsed for parity)")
    p.add_argument("--grad_normalization_mode", type=str, default="none",
                   choices=["none", "divide_by_visible_count",
                            "multiply_by_visible_count",
                            "square_multiply_by_visible_count"])
    p.add_argument("--local_sampling", action="store_true")
    p.add_argument("--preload_dataset_to_gpu", action="store_true")
    p.add_argument("--preload_dataset_to_gpu_threshold", type=int, default=10,
                   help="GB; datasets smaller than this are auto-preloaded "
                        "to device memory (<=0 disables auto-preload)")
    p.add_argument("--adjust_strategy_warmp_iterations", type=int, default=-1)
    p.add_argument("--num_train_cameras", type=int, default=-1)
    p.add_argument("--num_test_cameras", type=int, default=-1)
    p.add_argument("--save_strategy_history", action="store_true")
    p.add_argument("--image_distribution_mode", type=str, default="final",
                   help="parsed for reference compatibility; only the live "
                        "'final' system exists (ref modes 0-4 are dead code)")
    p.add_argument("--border_divpos_coeff", type=float, default=1.0,
                   help="snap division points within this many tile rows "
                        "of an image boundary to the boundary")
    # PipelineParams
    p.add_argument("--tile", type=str, default=None,
                   help="WxH tile geometry (default 32x16, measured round-4"
                        " optimum; the reference hardwires 16x16). Pixel"
                        " count must be a multiple of 128")
    p.add_argument("--backend", type=str, default="auto",
                   choices=["auto", "pallas", "jax", "default", "gsplat"],
                   help="rasterizer backend: pallas (TPU kernels) | jax "
                        "(pure-XLA). 'default'/'gsplat' are accepted as the "
                        "reference's names and map to auto/jax")
    # OptimizationParams (cont.)
    p.add_argument("--densify_memory_limit_percentage", type=float,
                   default=0.9)
    p.add_argument("--lr_scale_pos_and_scale", type=float, default=1.0)
    # BenchmarkParams
    p.add_argument("--end2end_time", type=int, default=1,
                   help="log train-only wall time excluding eval/save")
    p.add_argument("--check_gpu_memory", action="store_true")
    p.add_argument("--check_cpu_memory", action="store_true")
    p.add_argument("--log_memory_summary", action="store_true")
    p.add_argument("--nsys_profile", action="store_true",
                   help="capture a jax.profiler trace of ~10 steady-state "
                        "steps into <model_path>/trace")
    p.add_argument("--zhx_time", action="store_true",
                   help="reference alias for --enable_timer")
    p.add_argument("--zhx_debug", action="store_true",
                   help="reference alias for --debug")
    # DebugParams
    p.add_argument("--debug", action="store_true")
    p.add_argument("--detect_anomaly", action="store_true",
                   help="jax_debug_nans: fail fast on NaN/Inf (the JAX "
                        "analogue of torch.autograd.set_detect_anomaly)")
    p.add_argument("--stop_update_param", action="store_true")
    p.add_argument("--drop_initial_3dgs_p", type=float, default=0.0)
    p.add_argument("--drop_duplicate_gaussians_coeff", type=float,
                   default=1.0,
                   help="replicate checkpointed Gaussians on load "
                        "(scaling experiments)")
    # misc reference-parity
    p.add_argument("--quiet", "-q", action="store_true")
    p.add_argument("--log_folder", type=str, default="",
                   help="log file directory (default: model_path)")
    p.add_argument("--multiprocesses_image_loading", type=int, default=1,
                   help="0 = single-threaded GT decode")
    p.add_argument("--time_image_loading", action="store_true")
    # schedule / misc
    p.add_argument("--test_iterations", nargs="+", type=int,
                   default=[7_000, 30_000])
    p.add_argument("--save_iterations", nargs="+", type=int,
                   default=[7_000, 30_000])
    p.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    p.add_argument("--start_checkpoint", type=str, default=None)
    p.add_argument("--auto_start_checkpoint", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_interval", type=int, default=250)
    p.add_argument("--enable_timer", action="store_true",
                   help="per-stage wall times logged every log_interval "
                        "(forces a device sync per step, like the "
                        "reference's --enable_timer cuda.synchronize)")
    # TPU-specific
    p.add_argument("--n_devices", type=int, default=-1,
                   help="-1 = all visible devices")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform, e.g. 'cpu' (with "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "for a virtual multi-device mesh)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on a generated synthetic scene (smoke test)")
    p.add_argument("--synthetic_size", type=str, default="160x120",
                   help="WxH of the synthetic scene")
    p.add_argument("--synthetic_gaussians", type=int, default=400)
    p.add_argument("--synthetic_points", type=int, default=300)
    p.add_argument("--synthetic_structured", action="store_true",
                   help="train on the raytraced structured protocol scene "
                        "(hemisphere rig, llffhold held-out split — the "
                        "hermetic stand-in for Mip360 quality evidence)")
    p.add_argument("--synthetic_cams", type=int, default=72,
                   help="total cameras on the structured hemisphere rig")
    return p


def args_to_config(a):
    from grendel_tpu.config import TrainConfig

    cfg = TrainConfig()
    cfg.model.sh_degree = a.sh_degree
    cfg.model.source_path = a.source_path
    cfg.model.model_path = a.model_path
    cfg.model.images = a.images
    cfg.model.white_background = a.white_background
    cfg.model.eval = a.eval
    cfg.model.llffhold = a.llffhold
    cfg.model.resolution = a.resolution
    o = cfg.opt
    for f in ("iterations", "position_lr_init", "position_lr_final",
              "position_lr_delay_mult", "position_lr_max_steps", "feature_lr",
              "opacity_lr", "scaling_lr", "rotation_lr", "lambda_dssim",
              "percent_dense", "densification_interval",
              "opacity_reset_interval", "opacity_reset_until_iter",
              "densify_from_iter", "densify_until_iter",
              "densify_grad_threshold", "disable_auto_densification",
              "min_opacity", "lr_scale_mode", "lr_scale_loss",
              "random_background", "densify_memory_limit_percentage",
              "lr_scale_pos_and_scale"):
        setattr(o, f, getattr(a, f))
    cfg.stop_update_param = a.stop_update_param
    cfg.drop_initial_3dgs_p = a.drop_initial_3dgs_p
    cfg.drop_duplicate_gaussians_coeff = a.drop_duplicate_gaussians_coeff
    cfg.quiet = a.quiet
    cfg.log_folder = a.log_folder
    cfg.end2end_time = bool(a.end2end_time)
    cfg.check_gpu_memory = a.check_gpu_memory
    cfg.check_cpu_memory = a.check_cpu_memory
    cfg.log_memory_summary = a.log_memory_summary
    cfg.nsys_profile = a.nsys_profile
    cfg.pipeline.debug = a.debug or a.zhx_debug
    if a.tile:
        tw, th = (int(x) for x in a.tile.split("x"))
        assert (tw * th) % 128 == 0, "tile pixel count must be 128-multiple"
        cfg.pipeline.tile_w, cfg.pipeline.tile_h = tw, th
    # ref backend names: "default" (their CUDA fork) -> auto, "gsplat"
    # (their second backend) -> the pure-XLA backend
    cfg.pipeline.backend = {"default": "auto", "gsplat": "jax"}.get(
        a.backend, a.backend)
    d = cfg.dist
    d.bsz = a.bsz
    d.gaussians_distribution = bool(a.gaussians_distribution)
    d.image_distribution = bool(a.image_distribution)
    d.heuristic_decay = a.heuristic_decay
    d.no_heuristics_update = a.no_heuristics_update
    d.redistribute_gaussians_mode = a.redistribute_gaussians_mode
    d.redistribute_gaussians_frequency = a.redistribute_gaussians_frequency
    d.redistribute_gaussians_threshold = a.redistribute_gaussians_threshold
    d.distributed_dataset_storage = bool(a.distributed_dataset_storage)
    d.distributed_save = bool(a.distributed_save)
    d.sync_grad_mode = a.sync_grad_mode
    d.grad_normalization_mode = a.grad_normalization_mode
    d.local_sampling = a.local_sampling
    d.preload_dataset_to_gpu = a.preload_dataset_to_gpu
    d.preload_dataset_to_gpu_threshold = a.preload_dataset_to_gpu_threshold
    d.adjust_strategy_warmp_iterations = a.adjust_strategy_warmp_iterations
    d.save_strategy_history = a.save_strategy_history
    d.num_train_cameras = a.num_train_cameras
    d.num_test_cameras = a.num_test_cameras
    cfg.test_iterations = list(a.test_iterations)
    cfg.save_iterations = list(a.save_iterations)
    cfg.checkpoint_iterations = list(a.checkpoint_iterations)
    cfg.start_checkpoint = a.start_checkpoint
    cfg.auto_start_checkpoint = a.auto_start_checkpoint
    cfg.seed = a.seed
    cfg.log_interval = a.log_interval
    cfg.enable_timer = a.enable_timer or a.zhx_time
    d.image_distribution_mode = a.image_distribution_mode
    d.border_divpos_coeff = a.border_divpos_coeff
    return cfg.finalize()


def make_decode_mask(cfg, devices):
    """Per-host GT decode/storage policy for --distributed_dataset_storage.

    The reference stores GT images only on node-local rank 0 and P2P-ships
    row slices per step (scene/cameras.py:52-73, utils/camera_utils.py:
    37-49). Here each host decodes a subset at load time and any other
    camera decodes lazily at pack time (Camera.gt()):
      * local_sampling: only cameras of this host's device groups
        (uid % D in the mesh positions of its addressable devices) — those
        are the only cameras whose rows its devices ever render;
      * otherwise: process-strided storage (uid % P == process_index); the
        balancer can route any camera's rows anywhere, so the stride bounds
        resident memory at dataset/P and the lazy path covers the rest.
    Returns None (decode everything) off the multi-process path.
    """
    import jax

    if not cfg.dist.distributed_dataset_storage or jax.process_count() == 1:
        return None
    procs, pidx = jax.process_count(), jax.process_index()
    if cfg.dist.local_sampling:
        local_pos = {i for i, dev in enumerate(devices)
                     if dev.process_index == pidx}
        d_count = len(devices)
        return lambda i, ci: (i % d_count) in local_pos
    return lambda i, ci: (i % procs) == pidx


def main():
    a = build_parser().parse_args()
    if not (a.synthetic or a.synthetic_structured) and not a.source_path:
        raise SystemExit("need --source_path (or --synthetic[_structured])")
    if not a.model_path:
        a.model_path = os.path.join(
            "output",
            "synthetic_structured" if a.synthetic_structured else
            "synthetic" if a.synthetic else
            os.path.basename(os.path.normpath(a.source_path)))

    import jax
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    if a.detect_anomaly:
        # fail fast on NaN/Inf anywhere in the jitted step (the JAX
        # analogue of ref torch.autograd.set_detect_anomaly, train.py:67)
        jax.config.update("jax_debug_nans", True)
    if os.environ.get("GRENDEL_MULTIHOST"):
        # multi-host launch (one process per host on a pod slice):
        # coordinator/process env vars per standard JAX distributed setup
        jax.distributed.initialize()
    from grendel_tpu.engine.trainer import Trainer
    from grendel_tpu.engine.checkpoint import find_latest_checkpoint

    cfg = args_to_config(a)
    os.makedirs(cfg.model.model_path, exist_ok=True)
    with open(os.path.join(cfg.model.model_path, "args.json"), "w") as f:
        json.dump(vars(a), f, indent=2)
    if cfg.auto_start_checkpoint and cfg.start_checkpoint is None:
        cfg.start_checkpoint = find_latest_checkpoint(cfg.model.model_path)

    devices = jax.devices()
    if a.n_devices > 0:
        devices = devices[: a.n_devices]
    ws = len(devices)

    if a.synthetic_structured:
        from grendel_tpu.testing import StructuredSyntheticScene

        w, h = (int(x) for x in a.synthetic_size.split("x"))
        t_gen = time.time()
        scene = StructuredSyntheticScene(
            width=w, height=h, n_cams=a.synthetic_cams,
            llffhold=a.llffhold, n_init_points=a.synthetic_points,
            seed=a.seed)
        print(f"[structured] raytraced {a.synthetic_cams} GT views at "
              f"{w}x{h} in {time.time() - t_gen:.1f}s "
              f"({len(scene.train_cameras)} train / "
              f"{len(scene.test_cameras)} held-out)", flush=True)
    elif a.synthetic:
        from grendel_tpu.testing import SyntheticScene

        w, h = (int(x) for x in a.synthetic_size.split("x"))
        scene = SyntheticScene(width=w, height=h, sh_degree=min(a.sh_degree, 1),
                               seed=a.seed,
                               n_gaussians=a.synthetic_gaussians,
                               n_init_points=a.synthetic_points)
    else:
        from grendel_tpu.data import Scene

        t_load = time.time()
        scene = Scene(
            a.source_path, images=a.images, eval_split=a.eval,
            llffhold=a.llffhold, white_background=a.white_background,
            num_train=a.num_train_cameras, num_test=a.num_test_cameras,
            seed=a.seed, resolution=a.resolution,
            decode_mask=make_decode_mask(cfg, devices),
            decode_workers=8 if a.multiprocesses_image_loading else 1,
        )
        if a.time_image_loading:
            print(f"[timing] scene + GT decode: {time.time() - t_load:.2f}s",
                  flush=True)
        stored = sum(c.gt_image_u8 is not None for c in scene.train_cameras)
        if stored < len(scene.train_cameras):
            print(f"[storage] host {jax.process_index()}: decoded "
                  f"{stored}/{len(scene.train_cameras)} train GT images "
                  f"(--distributed_dataset_storage; rest decode on demand)",
                  flush=True)
    os.makedirs(cfg.log_folder, exist_ok=True)
    log_path = os.path.join(cfg.log_folder,
                            f"python_ws={ws}_rk={jax.process_index()}.log")
    with open(log_path, "a") as log_file:
        trainer = Trainer(cfg, scene, devices=devices, log_file=log_file)
        trainer.train()
        trainer.save_model(int(jax.device_get(trainer.state.iteration)))


if __name__ == "__main__":
    main()
