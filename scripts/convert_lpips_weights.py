#!/usr/bin/env python
"""Convert torch LPIPS (VGG16) weights into the .npz format ops/lpips.py
loads.

Inputs (both obtainable in any environment with network access):
  * torchvision VGG16 features state dict  (vgg16-*.pth)
  * LPIPS linear-head state dict (the 'vgg.pth' from richzhang/
    PerceptualSimilarity — keys lin0..lin4.model.1.weight)

  python scripts/convert_lpips_weights.py --vgg vgg16.pth \
      --lins lpips_vgg.pth --out lpips_vgg16.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# indices of conv layers in torchvision vgg16.features
_VGG16_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert(vgg_state: dict, lins_state: dict) -> dict:
    """Map torch state dicts -> the npz key layout of ops/lpips.py."""
    out = {}
    for i, layer in enumerate(_VGG16_CONV_IDS):
        w = vgg_state.get(f"features.{layer}.weight",
                          vgg_state.get(f"{layer}.weight"))
        b = vgg_state.get(f"features.{layer}.bias",
                          vgg_state.get(f"{layer}.bias"))
        assert w is not None and b is not None, f"missing conv {layer}"
        out[f"conv{i}_w"] = np.asarray(w, np.float32)
        out[f"conv{i}_b"] = np.asarray(b, np.float32)
    for j in range(5):
        key = f"lin{j}.model.1.weight"
        w = lins_state.get(key, lins_state.get(f"lin{j}.weight"))
        assert w is not None, f"missing {key}"
        out[f"lin{j}_w"] = np.asarray(w, np.float32).reshape(-1)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vgg", required=True)
    p.add_argument("--lins", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    import torch

    vgg = torch.load(a.vgg, map_location="cpu")
    lins = torch.load(a.lins, map_location="cpu")
    to_np = lambda d: {k: v.numpy() if hasattr(v, "numpy") else v
                       for k, v in d.items()}
    np.savez(a.out, **convert(to_np(vgg), to_np(lins)))
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
