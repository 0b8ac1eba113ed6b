"""LPIPS perceptual metric (VGG16 backbone) in JAX.

Parity target: /root/reference/lpipsPyTorch/ (VGG-feature LPIPS used by
metrics.py). The reference downloads pretrained torchvision VGG16 weights
plus the LPIPS linear heads at runtime; this environment has no network
egress, so weights must be supplied as an ``.npz`` file (see
``load_weights`` for the expected keys). Without weights the metric is
unavailable and callers should report LPIPS as null (scripts/metrics.py
does exactly that).

Architecture (matching lpips 'vgg' variant):
  * VGG16 features, ReLU activations, 5 taps after relu1_2, relu2_2,
    relu3_3, relu4_3, relu5_3;
  * input normalized with shift/scale constants;
  * per-tap unit-normalize along channels, squared difference, 1x1 linear
    head, spatial mean; sum over taps.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# channel shift/scale used by LPIPS ("scaling layer")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (out_channels, pool_before)
_VGG16_PLAN = [
    (64, False), (64, False),          # relu1_1, relu1_2  <- tap 0
    (128, True), (128, False),         # relu2_1, relu2_2  <- tap 1
    (256, True), (256, False), (256, False),   # relu3_*   <- tap 2
    (512, True), (512, False), (512, False),   # relu4_*   <- tap 3
    (512, True), (512, False), (512, False),   # relu5_*   <- tap 4
]
_TAPS = [1, 3, 6, 9, 12]


def load_weights(path: str) -> Dict[str, np.ndarray]:
    """Expected keys: conv{i}_w (O,I,3,3), conv{i}_b (O,) for i in 0..12,
    lin{j}_w (C,) for j in 0..4 (the 1x1 head weights, non-negative)."""
    return dict(np.load(path))


def _conv(x: Array, w: Array, b: Array) -> Array:
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + jnp.asarray(b)[None, :, None, None]


def _vgg_features(x: Array, weights: Dict[str, np.ndarray]) -> List[Array]:
    feats = []
    h = x
    for i, (_, pool) in enumerate(_VGG16_PLAN):
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        h = jax.nn.relu(_conv(h, weights[f"conv{i}_w"], weights[f"conv{i}_b"]))
        if i in _TAPS:
            feats.append(h)
    return feats


def lpips(img1: Array, img2: Array,
          weights: Dict[str, np.ndarray]) -> Array:
    """LPIPS distance between (3, H, W) images in [0, 1]."""
    def prep(im):
        im = im * 2.0 - 1.0                       # [-1, 1]
        im = (im - jnp.asarray(_SHIFT)[:, None, None]) / (
            jnp.asarray(_SCALE)[:, None, None])
        return im[None]

    f1 = _vgg_features(prep(img1), weights)
    f2 = _vgg_features(prep(img2), weights)
    total = jnp.float32(0.0)
    for j, (a, b) in enumerate(zip(f1, f2)):
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2                        # (1, C, h, w)
        lin = jnp.asarray(weights[f"lin{j}_w"])[None, :, None, None]
        total = total + jnp.mean(jnp.sum(diff * lin, axis=1))
    return total


def lpips_available(weights_path: Optional[str]) -> bool:
    if not weights_path:
        return False
    import os

    return os.path.exists(weights_path)
