"""Dense reference rasterizer — the correctness oracle.

Blends *every* Gaussian against *every* pixel (O(N * H * W) memory), with
the same tile-rect gating, clamping and stop rules as the tiled backends,
so tiled / Pallas outputs must match it exactly on scenes that fit. Used
only in tests and debugging; trivially correct by construction and fully
differentiable via JAX autodiff (which is how we golden-test the custom
VJP of the Pallas backend).
"""

from __future__ import annotations

import jax.numpy as jnp

from .blend import splat_alpha, blend_weights
from .isect import gaussian_tile_rect
from .projection import ProjectedSplats

Array = jnp.ndarray


def rasterize_dense(
    splats: ProjectedSplats,
    img_h: int,
    img_w: int,
    tile_w: int = 16,
    tile_h: int = 16,
    bg: Array | None = None,
):
    """Returns (image (3,H,W), final_T (H,W))."""
    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    n = splats.means2d.shape[0]
    tiles_x = -(-img_w // tile_w)
    tiles_y = -(-img_h // tile_h)

    order = jnp.argsort(splats.depths)
    m2d = splats.means2d[order]
    con = splats.conics[order]
    rgb = splats.colors[order]
    op = splats.opacities[order]
    rad = splats.radii[order]

    # pixel grid
    py, px = jnp.mgrid[0:img_h, 0:img_w]
    px = px.reshape(-1).astype(jnp.float32)       # (P,)
    py = py.reshape(-1).astype(jnp.float32)
    ptx = (px // tile_w).astype(jnp.int32)
    pty = (py // tile_h).astype(jnp.int32)

    # tile-rect gating: a Gaussian only touches pixels of tiles in its rect
    x0, y0, spanx, spany = gaussian_tile_rect(m2d, rad, tile_w, tile_h, tiles_x, tiles_y)
    in_rect = (
        (ptx[None, :] >= x0[:, None])
        & (ptx[None, :] < (x0 + spanx)[:, None])
        & (pty[None, :] >= y0[:, None])
        & (pty[None, :] < (y0 + spany)[:, None])
    )                                             # (N, P)

    dx = px[None, :] - m2d[:, 0:1]
    dy = py[None, :] - m2d[:, 1:2]
    alphas = splat_alpha(dx, dy, con, op) * in_rect

    weights, t_out = blend_weights(alphas, jnp.ones(px.shape[0], dtype=jnp.float32))
    color = jnp.einsum("np,nc->pc", weights, rgb) + t_out[:, None] * bg[None, :]

    image = color.reshape(img_h, img_w, 3).transpose(2, 0, 1)
    return image, t_out.reshape(img_h, img_w)
