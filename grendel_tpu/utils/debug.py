"""Debug dumps for cross-run / cross-shard diffing.

Parity target: /root/reference/utils/debug_utils.py:6-86 — dump images,
tile masks and per-pixel loss maps as *text* files so two runs (or two
shards) can be compared with plain ``diff``. Used when chasing
distributed-vs-single-chip divergence.
"""

from __future__ import annotations

import os

import numpy as np


def save_image_txt(path: str, image, precision: int = 6) -> None:
    """(C, H, W) array -> text, one pixel per line 'y x: r g b'."""
    arr = np.asarray(image)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    c, h, w = arr.shape
    with open(path, "w") as f:
        f.write(f"# shape {c} {h} {w}\n")
        for y in range(h):
            for x in range(w):
                vals = " ".join(f"{arr[k, y, x]:.{precision}f}" for k in range(c))
                f.write(f"{y} {x}: {vals}\n")


def save_mask_txt(path: str, mask) -> None:
    """(H, W) bool/int mask -> text rows of 0/1."""
    arr = np.asarray(mask).astype(int)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(f"# shape {arr.shape[0]} {arr.shape[1]}\n")
        for row in arr:
            f.write("".join(str(v) for v in row) + "\n")


def save_array_txt(path: str, array, precision: int = 6) -> None:
    """Flat dump of any array with index prefix (diff-friendly)."""
    arr = np.asarray(array).reshape(-1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(f"# shape {np.asarray(array).shape}\n")
        for i, v in enumerate(arr):
            f.write(f"{i}: {v:.{precision}f}\n")


def compare_txt_dumps(path_a: str, path_b: str, atol: float = 1e-5) -> int:
    """Count lines whose numeric payloads differ by more than atol."""
    bad = 0
    with open(path_a) as fa, open(path_b) as fb:
        for la, lb in zip(fa, fb):
            if la.startswith("#") or la == lb:
                continue
            try:
                va = [float(t) for t in la.split(":")[1].split()]
                vb = [float(t) for t in lb.split(":")[1].split()]
                if any(abs(x - y) > atol for x, y in zip(va, vb)):
                    bad += 1
            except (IndexError, ValueError):
                bad += 1
    return bad
