"""Training loss: (1 - lambda) * L1 + lambda * (1 - SSIM).

Parity target: the reference's live loss path
(`final_system_loss_computation` / `batched_loss_computation`,
/root/reference/gaussian_renderer/loss_distribution.py:2536-2637): per-camera
pixelwise L1 and SSIM maps, each normalized by the *global* pixel count x 3,
summed over the batch (the caller divides gradients by bsz). The masked
variants make per-shard partial sums add up to the exact global loss in the
distributed path (mask = owned rows; SSIM windows truncate at row-span
borders exactly as the reference accepts).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..ops.ssim import ssim_map, pixelwise_l1_with_mask

Array = jnp.ndarray


def camera_loss(
    image: Array,            # (3, H, W) rendered
    gt: Array,               # (3, H, W) float in [0, 1]
    lambda_dssim: float = 0.2,
    mask: Optional[Array] = None,        # (H, W) ownership mask (distributed)
    global_pixels: Optional[int] = None, # normalizer; default H*W
) -> Tuple[Array, Array, Array]:
    """Returns (loss, l1_partial, ssim_partial) for one camera.

    With mask=None this equals the classic 3DGS loss. With a mask, the
    partial values sum across shards to the global loss because every term
    is normalized by the global pixel count.
    """
    h, w = image.shape[-2:]
    denom = 3.0 * (global_pixels if global_pixels is not None else h * w)
    m = jnp.ones((h, w), jnp.float32) if mask is None else mask.astype(jnp.float32)

    l1_map = pixelwise_l1_with_mask(image, gt, m)
    l1 = jnp.sum(l1_map) / denom
    s_map = ssim_map(image, gt) * m
    ssim_val = jnp.sum(s_map) / denom
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_val)
    return loss, l1, ssim_val


def batch_loss(
    images: Array,           # (B, 3, H, W)
    gts: Array,              # (B, 3, H, W)
    lambda_dssim: float = 0.2,
    masks: Optional[Array] = None,       # (B, H, W)
    global_pixels: Optional[int] = None,
    lr_scale_loss: float = 1.0,
) -> Tuple[Array, Array]:
    """Sum of per-camera losses (ref: batched_loss_computation,
    loss_distribution.py:2588-2637). Returns (loss_sum, (B, 2) [l1, ssim]).

    The batch folds into the blur's channel axis instead of a vmap over
    cameras: vmapping the separable blur turns its dynamic slices into
    batched gathers (measured 2.4x the flat cost at garden resolution);
    the blur is channel-independent, so (B,3,H,W) -> (B*3,H,W) is exact.
    """
    b, c, h, w = images.shape
    denom = 3.0 * (global_pixels if global_pixels is not None else h * w)
    s_map = ssim_map(images.reshape(b * c, h, w),
                     gts.reshape(b * c, h, w)).reshape(b, c, h, w)
    l1_map = jnp.abs(images - gts)
    if masks is not None:
        m = masks.astype(jnp.float32)[:, None]
        s_map = s_map * m
        l1_map = l1_map * m
    l1s = jnp.sum(l1_map, axis=(1, 2, 3)) / denom
    ssims = jnp.sum(s_map, axis=(1, 2, 3)) / denom
    losses = (1.0 - lambda_dssim) * l1s + lambda_dssim * (1.0 - ssims)
    return jnp.sum(losses) * lr_scale_loss, jnp.stack([l1s, ssims], axis=-1)
