#!/usr/bin/env python
"""Metrics CLI (parity target: /root/reference/metrics.py): read
renders/gt PNG pairs produced by scripts/render.py and write
``results_{set}.json`` with SSIM / PSNR (and LPIPS when a weights file is
available — the reference's lpipsPyTorch downloads pretrained VGG weights,
which this zero-egress environment cannot; pass --lpips_weights to enable).

  python scripts/metrics.py -m out/run1
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    p.add_argument("--lpips_weights", type=str,
                   default=os.environ.get("GRENDEL_LPIPS_WEIGHTS"),
                   help="npz from scripts/convert_lpips_weights.py; also "
                        "read from $GRENDEL_LPIPS_WEIGHTS. Absent -> LPIPS "
                        "reported null (ref metrics.py:77-120 computes it "
                        "from downloaded VGG weights; zero-egress here)")
    p.add_argument("--platform", type=str, default=None)
    a = p.parse_args(argv)

    import jax

    if a.platform:
        jax.config.update("jax_platforms", a.platform)

    import numpy as np
    import jax.numpy as jnp
    from PIL import Image
    from grendel_tpu.ops.ssim import ssim as ssim_fn, psnr as psnr_fn

    lpips_weights = None
    if a.lpips_weights:
        from grendel_tpu.ops.lpips import load_weights

        lpips_weights = load_weights(a.lpips_weights)
        print(f"LPIPS enabled (weights: {a.lpips_weights})")

    @jax.jit
    def both(r, g):
        return ssim_fn(r, g), psnr_fn(r, g)

    lpips_jit = None
    if lpips_weights is not None:
        from grendel_tpu.ops.lpips import lpips as lpips_fn

        lpips_jit = jax.jit(lambda r, g: lpips_fn(r, g, lpips_weights))

    for model_path in a.model_paths:
        print(f"Scene: {model_path}")
        for split in ("test", "train"):
            split_dir = os.path.join(model_path, split)
            if not os.path.isdir(split_dir):
                continue
            full = {}
            per_view = {}
            for method in sorted(os.listdir(split_dir)):
                rdir = os.path.join(split_dir, method, "renders")
                gdir = os.path.join(split_dir, method, "gt")
                if not (os.path.isdir(rdir) and os.path.isdir(gdir)):
                    continue
                ssims, psnrs, lpipss, names = [], [], [], []
                for fn in sorted(os.listdir(rdir)):
                    rp = os.path.join(rdir, fn)
                    gp = os.path.join(gdir, fn)
                    if not os.path.exists(gp):
                        continue
                    r = np.asarray(Image.open(rp), np.float32)[..., :3] / 255.0
                    g = np.asarray(Image.open(gp), np.float32)[..., :3] / 255.0
                    r = jnp.asarray(r.transpose(2, 0, 1))
                    g = jnp.asarray(g.transpose(2, 0, 1))
                    s, ps = both(r, g)
                    ssims.append(float(s))
                    psnrs.append(float(ps))
                    if lpips_jit is not None:
                        lpipss.append(float(lpips_jit(r, g)))
                    names.append(fn)
                if not names:
                    continue
                lp_str = (f"{np.mean(lpipss):.7f}" if lpipss else "n/a")
                print(f"  {split}/{method}: "
                      f"SSIM {np.mean(ssims):.7f}  PSNR {np.mean(psnrs):.7f}  "
                      f"LPIPS {lp_str} ({len(names)} views)")
                full[method] = {
                    "SSIM": float(np.mean(ssims)),
                    "PSNR": float(np.mean(psnrs)),
                    "LPIPS": float(np.mean(lpipss)) if lpipss else None,
                }
                per_view[method] = {
                    "SSIM": dict(zip(names, ssims)),
                    "PSNR": dict(zip(names, psnrs)),
                }
                if lpipss:
                    per_view[method]["LPIPS"] = dict(zip(names, lpipss))
            if full:
                with open(os.path.join(model_path,
                                       f"results_{split}.json"), "w") as f:
                    json.dump(full, f, indent=2)
                with open(os.path.join(model_path,
                                       f"per_view_{split}.json"), "w") as f:
                    json.dump(per_view, f, indent=2)


if __name__ == "__main__":
    main()
