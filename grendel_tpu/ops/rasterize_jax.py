"""Tiled rasterizer in pure JAX (vmap over tiles, scan over Gaussian chunks).

Defines the production semantics (identical to the dense oracle in
rasterize_ref.py) with static shapes: each tile walks its depth-ordered
entry list in fixed-size chunks, blending front-to-back with the shared
``blend`` math. Differentiable end-to-end via autodiff; the per-chunk body
is rematerialized (jax.checkpoint) so backward memory stays O(tiles * P).

Two layers:
  * ``rasterize_slots`` — the core: blends an arbitrary set of "tile slots"
    given per-slot pixel origins and a per-slot entry list. Camera-agnostic;
    this is what the distributed pixel-parallel path calls with its owned
    tile-row slots spanning multiple cameras (SURVEY.md §2.2: the reference
    partitions batched images by tile rows).
  * ``rasterize_tiles`` — the single-image wrapper: full tile grid of one
    camera, reassembles (3, H, W).

The Pallas backend (rasterize_pallas.py) implements the same contract with
hand-written kernels; this module is the fallback path and the reference
the Pallas kernels are tested against.

Distributed pixel parallelism hook: ``tile_mask`` — a (num_tiles,) bool
vector (the reference's ``compute_locally`` per-tile mask, SURVEY.md §2.2)
that zeroes non-owned tiles.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .blend import splat_alpha, blend_weights
from .isect import TileIntersections
from .projection import ProjectedSplats

Array = jnp.ndarray


class RenderAux(NamedTuple):
    final_t: Array      # (H, W) remaining transmittance
    n_entries: Array    # (num_tiles,) entries per tile (pre-truncation)
    num_isects: Array   # () total intersections produced by isect


def rasterize_slots(
    means2d: Array,       # (M, 2) screen positions (per received entry set)
    conics: Array,        # (M, 3)
    colors: Array,        # (M, 3)
    opacities: Array,     # (M,)
    gauss_ids: Array,     # (capacity,) entry -> index into the M arrays
    tile_offsets: Array,  # (T + 1,) entry span per tile slot
    slot_px0: Array,      # (T,) pixel-x origin of each slot
    slot_py0: Array,      # (T,) pixel-y origin of each slot
    tile_w: int,
    tile_h: int,
    max_per_tile: int,
    chunk: int,
) -> Tuple[Array, Array]:
    """Blend every tile slot. Returns (colors (T, P, 3), final_t (T, P))
    with P = tile_h * tile_w, pixels in row-major order within the slot."""
    t_slots = slot_px0.shape[0]
    p = tile_h * tile_w
    capacity = gauss_ids.shape[0]
    n_chunks = -(-max_per_tile // chunk)

    starts = tile_offsets[:-1]
    ends = tile_offsets[1:]

    lx = jnp.arange(tile_w, dtype=jnp.float32)
    ly = jnp.arange(tile_h, dtype=jnp.float32)
    # (T, P) pixel coordinates
    px = (slot_px0[:, None].astype(jnp.float32) + lx[None, :])
    px = px[:, None, :].repeat(tile_h, 1).reshape(t_slots, p)
    py = (slot_py0[:, None].astype(jnp.float32) + ly[None, :])
    py = py[:, :, None].repeat(tile_w, 2).reshape(t_slots, p)

    def chunk_body(carry, c, start, end, pxt, pyt):
        t_in, color = carry
        k = start + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = k < end
        ids = gauss_ids[jnp.clip(k, 0, capacity - 1)]
        xy = means2d[ids]                      # (chunk, 2)
        cn = conics[ids]
        cl = colors[ids]
        o = jnp.where(valid, opacities[ids], 0.0)
        dx = pxt[None, :] - xy[:, 0:1]
        dy = pyt[None, :] - xy[:, 1:2]
        a = splat_alpha(dx, dy, cn, o)
        w, t_out = blend_weights(a, t_in)
        color = color + w.T @ cl               # (P, 3)
        return (t_out, color), None

    def tile_fn(start, end, pxt, pyt):
        body = jax.checkpoint(
            lambda carry, c: chunk_body(carry, c, start, end, pxt, pyt)
        )
        init = (jnp.ones(p, dtype=jnp.float32), jnp.zeros((p, 3), dtype=jnp.float32))
        (t_out, color), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
        return color, t_out

    return jax.vmap(tile_fn)(starts, ends, px, py)   # (T,P,3), (T,P)


def rasterize_tiles(
    splats: ProjectedSplats,
    isect: TileIntersections,
    img_h: int,
    img_w: int,
    tile_w: int = 16,
    tile_h: int = 16,
    bg: Array | None = None,
    max_per_tile: int = 4096,
    chunk: int = 64,
    tile_mask: Array | None = None,
):
    """Render one camera from per-tile entry lists.

    Returns (image (3, H, W), RenderAux). Entries beyond ``max_per_tile``
    per tile are dropped (front-to-back saturation makes the tail nearly
    invisible; the aux reports true counts so callers can retune).
    """
    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    tiles_x = -(-img_w // tile_w)
    tiles_y = -(-img_h // tile_h)
    num_tiles = tiles_x * tiles_y
    p = tile_h * tile_w

    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    slot_px0 = (t_ids % tiles_x) * tile_w
    slot_py0 = (t_ids // tiles_x) * tile_h

    colors, t_final = rasterize_slots(
        splats.means2d, splats.conics, splats.colors, splats.opacities,
        isect.gauss_ids, isect.tile_offsets, slot_px0, slot_py0,
        tile_w, tile_h, max_per_tile, chunk,
    )

    if tile_mask is not None:
        colors = colors * tile_mask[:, None, None]
        t_final = jnp.where(tile_mask[:, None], t_final, 1.0)

    colors = colors + t_final[..., None] * bg[None, None, :]
    if tile_mask is not None:
        # masked tiles render as exact zero (reference zeroes non-owned pixels)
        colors = colors * tile_mask[:, None, None]

    # (T, P, 3) -> (H, W, 3), cropping tile padding
    img = colors.reshape(tiles_y, tiles_x, tile_h, tile_w, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tile_h, tiles_x * tile_w, 3)
    img = img[:img_h, :img_w].transpose(2, 0, 1)

    tmap = t_final.reshape(tiles_y, tiles_x, tile_h, tile_w)
    tmap = tmap.transpose(0, 2, 1, 3).reshape(tiles_y * tile_h, tiles_x * tile_w)
    tmap = tmap[:img_h, :img_w]

    aux = RenderAux(
        final_t=tmap,
        n_entries=isect.tile_offsets[1:] - isect.tile_offsets[:-1],
        num_isects=isect.num_isects,
    )
    return img, aux
