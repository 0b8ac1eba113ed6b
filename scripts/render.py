#!/usr/bin/env python
"""Offline rendering CLI (parity target: /root/reference/render.py).

Loads a trained model (PLY) and renders the scene's train/test cameras to
PNGs with the same distributed pipeline used in training:

  python scripts/render.py -m out/run1 -s <scene_dir> [--iteration N]
  python scripts/render.py -m out/run1 --skip_train
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", default=None)
    p.add_argument("--images", "-i", default="images")
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--llffhold", type=int, default=8)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--bsz", type=int, default=1)
    p.add_argument("--resolution", "-r", type=float, default=None,
                   help="GT downscale (defaults to the training run's)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform, e.g. 'cpu'")
    a = p.parse_args()

    import json
    import numpy as np
    import jax
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    import jax.numpy as jnp
    from PIL import Image
    from jax.sharding import Mesh
    from grendel_tpu.cameras import batch_camera_arrays
    from grendel_tpu.data import Scene
    from grendel_tpu.engine.gaussian_io import load_ply
    from grendel_tpu.engine.train import XyzLrSchedule
    from grendel_tpu.models import scaled_lrs
    from grendel_tpu.parallel import (
        ParallelConfig, ShardedTrainer, divide_rows,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    # merge saved args (ref get_combined_args, arguments/__init__.py:204-233)
    args_json = os.path.join(a.model_path, "args.json")
    if a.source_path is None and os.path.exists(args_json):
        with open(args_json) as f:
            saved = json.load(f)
        a.source_path = saved.get("source_path")
        a.sh_degree = saved.get("sh_degree", a.sh_degree)
        a.white_background = saved.get("white_background", a.white_background)
        a.llffhold = saved.get("llffhold", a.llffhold)
        if a.resolution is None:
            a.resolution = saved.get("resolution", -1)
    if a.resolution is None:
        a.resolution = -1
    synthetic = None
    if not a.source_path and os.path.exists(args_json):
        with open(args_json) as f:
            saved = json.load(f)
        if saved.get("synthetic") or saved.get("synthetic_structured"):
            # models trained with --synthetic[_structured]: rebuild the
            # deterministic synthetic scene from the saved args (same
            # cameras + GT)
            synthetic = saved
    if not a.source_path and synthetic is None:
        raise SystemExit("need --source_path (not found in saved args)")

    # find iteration
    pc_root = os.path.join(a.model_path, "point_cloud")
    it = a.iteration
    if it == -1:
        subs = [d for d in os.listdir(pc_root) if d.startswith("iteration_")]
        it = max(int(d.split("_")[1]) for d in subs)
    ply_dir = os.path.join(pc_root, f"iteration_{it}")

    devices = jax.devices()
    n_dev = len(devices)
    mesh = Mesh(np.array(devices), ("d",))

    if synthetic is not None and synthetic.get("synthetic_structured"):
        from grendel_tpu.testing import StructuredSyntheticScene

        w_s, h_s = (int(x) for x in synthetic["synthetic_size"].split("x"))
        scene = StructuredSyntheticScene(
            width=w_s, height=h_s,
            n_cams=synthetic.get("synthetic_cams", 72),
            llffhold=synthetic.get("llffhold", 8),
            n_init_points=synthetic.get("synthetic_points", 300),
            seed=synthetic.get("seed", 0))
    elif synthetic is not None:
        from grendel_tpu.testing import SyntheticScene

        w_s, h_s = (int(x) for x in synthetic["synthetic_size"].split("x"))
        scene = SyntheticScene(
            width=w_s, height=h_s,
            sh_degree=min(synthetic.get("sh_degree", 3), 1),
            seed=synthetic.get("seed", 0),
            n_gaussians=synthetic.get("synthetic_gaussians", 400),
            n_init_points=synthetic.get("synthetic_points", 300))
    else:
        scene = Scene(a.source_path, images=a.images, eval_split=a.eval,
                  llffhold=a.llffhold, white_background=a.white_background,
                  resolution=a.resolution)
    h = scene.train_cameras[0].height
    w = scene.train_cameras[0].width

    from grendel_tpu.models.gaussian_model import round_capacity
    params, alive = load_ply(ply_dir)
    total_cap = alive.shape[0]
    # round capacity to a multiple of the device count
    if total_cap % n_dev != 0:
        new_cap = round_capacity(total_cap, 256 * n_dev)
        from grendel_tpu.models.gaussian_model import pad_to_capacity
        params, alive = pad_to_capacity(params, alive, new_cap)
        total_cap = new_cap
    n_local = total_cap // n_dev

    cfg = ParallelConfig(
        n_devices=n_dev, bsz=a.bsz, img_h=h, img_w=w,
        isect_capacity=1 << max(16, int(np.ceil(np.log2(8 * n_local)))),
        max_per_tile=2048,
    ).resolved(n_local)
    lrs, s = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=a.bsz)
    trainer = ShardedTrainer(
        mesh, cfg, sh_degree=a.sh_degree, lambda_dssim=0.2, lrs=lrs,
        xyz_sched=XyzLrSchedule(1.6e-4, 1.6e-6, 0.01, 30000))

    spec_1d = NamedSharding(mesh, P("d"))
    params = jax.tree.map(lambda x: jax.device_put(x, spec_1d), params)
    alive = jax.device_put(alive, spec_1d)
    bg = jnp.asarray([1.0, 1.0, 1.0] if a.white_background else [0.0, 0.0, 0.0])
    pos = jnp.asarray(divide_rows(np.ones(cfg.total_rows), n_dev,
                                  cfg.n_row_slots))

    sets = []
    if not a.skip_train:
        sets.append(("train", scene.train_cameras))
    if not a.skip_test and scene.test_cameras:
        sets.append(("test", scene.test_cameras))

    for name, cams in sets:
        rdir = os.path.join(a.model_path, name, f"ours_{it}", "renders")
        gdir = os.path.join(a.model_path, name, f"ours_{it}", "gt")
        os.makedirs(rdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        for i in range(0, len(cams), a.bsz):
            batch = cams[i:i + a.bsz]
            if len(batch) < a.bsz:
                batch = batch + [batch[-1]] * (a.bsz - len(batch))
            imgs = trainer.render(params, alive, batch_camera_arrays(batch),
                                  pos, bg)
            imgs = np.asarray(jnp.clip(imgs, 0, 1))
            for b, cam in enumerate(cams[i:i + a.bsz]):
                arr = (imgs[b].transpose(1, 2, 0) * 255 + 0.5).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(rdir, f"{i + b:05d}.png"))
                gt = cam.gt()   # decodes on demand under lazy storage
                if gt is not None:
                    Image.fromarray(gt.transpose(1, 2, 0)).save(
                        os.path.join(gdir, f"{i + b:05d}.png"))
        print(f"rendered {len(cams)} {name} views -> {rdir}")


if __name__ == "__main__":
    main()
