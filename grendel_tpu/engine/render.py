"""Render pipeline: params -> projected splats -> tile lists -> image.

The single-chip analogue of the reference's live render path
(`distributed_preprocess3dgs_and_all2all_final` + `render_final`,
/root/reference/gaussian_renderer/__init__.py:878-1037, 1217-1291) without
the all2all: project the (local) Gaussians for each camera, build per-tile
depth-ordered entry lists, and alpha-blend tile-by-tile. The distributed
path (parallel/) reuses these pieces around the Gaussian<->pixel all2all.

All shapes static: the isect entry capacity and per-tile depth cutoff come
from RenderConfig and are re-tuned by the host at densification boundaries
(which are already recompile points).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..cameras import CameraArrays
from ..models.gaussian_model import GaussianParams, activated
from ..ops.projection import project_gaussians, ProjectedSplats
from ..ops.isect import isect_tiles
from ..ops.rasterize_jax import rasterize_tiles, RenderAux

Array = jnp.ndarray


class RenderConfig(NamedTuple):
    """Static render-shape configuration (hashable, jit-friendly)."""

    img_h: int
    img_w: int
    tile_w: int = 16
    tile_h: int = 16
    isect_capacity: int = 1 << 18
    max_per_tile: int = 2048
    chunk: int = 64
    backend: str = "jax"   # "jax" | "pallas" (TPU kernel)

    @property
    def tiles_x(self) -> int:
        return -(-self.img_w // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.img_h // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def render_splats(
    splats: ProjectedSplats,
    cfg: RenderConfig,
    bg: Optional[Array] = None,
    tile_mask: Optional[Array] = None,
) -> Tuple[Array, RenderAux]:
    """Rasterize already-projected splats for one camera."""
    isect = isect_tiles(
        splats.means2d, splats.radii, splats.depths,
        cfg.tile_w, cfg.tile_h, cfg.tiles_x, cfg.tiles_y,
        capacity=cfg.isect_capacity,
    )
    if cfg.backend == "pallas":
        return _rasterize_tiles_pallas(splats, isect, cfg, bg, tile_mask)
    return rasterize_tiles(
        splats, isect, cfg.img_h, cfg.img_w,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, bg=bg,
        max_per_tile=cfg.max_per_tile, chunk=cfg.chunk,
        tile_mask=tile_mask,
    )


def _rasterize_tiles_pallas(splats, isect, cfg: RenderConfig, bg, tile_mask):
    """Full-image wrapper over the Pallas tile kernel (same reassembly as
    rasterize_tiles)."""
    from ..ops.rasterize_pallas import rasterize_slots_pl

    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    tiles_x, tiles_y = cfg.tiles_x, cfg.tiles_y
    num_tiles = tiles_x * tiles_y
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    slot_px0 = (t_ids % tiles_x) * cfg.tile_w
    slot_py0 = (t_ids // tiles_x) * cfg.tile_h

    colors, t_final = rasterize_slots_pl(
        splats.means2d, splats.conics, splats.colors, splats.opacities,
        isect.gauss_ids, isect.tile_offsets, slot_px0, slot_py0,
        cfg.tile_w, cfg.tile_h, cfg.max_per_tile,
    )
    if tile_mask is not None:
        colors = colors * tile_mask[:, None, None]
        t_final = jnp.where(tile_mask[:, None], t_final, 1.0)
    colors = colors + t_final[..., None] * bg[None, None, :]
    if tile_mask is not None:
        colors = colors * tile_mask[:, None, None]

    th, tw = cfg.tile_h, cfg.tile_w
    img = colors.reshape(tiles_y, tiles_x, th, tw, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * th, tiles_x * tw, 3)
    img = img[: cfg.img_h, : cfg.img_w].transpose(2, 0, 1)
    tmap = t_final.reshape(tiles_y, tiles_x, th, tw)
    tmap = tmap.transpose(0, 2, 1, 3).reshape(tiles_y * th, tiles_x * tw)
    tmap = tmap[: cfg.img_h, : cfg.img_w]
    aux = RenderAux(
        final_t=tmap,
        n_entries=isect.tile_offsets[1:] - isect.tile_offsets[:-1],
        num_isects=isect.num_isects,
    )
    return img, aux


def render_image(
    params: GaussianParams,
    alive: Array,
    cam: CameraArrays,
    sh_degree: int,
    cfg: RenderConfig,
    bg: Optional[Array] = None,
    tile_mask: Optional[Array] = None,
) -> Tuple[Array, RenderAux]:
    """Render one camera view of the model. Returns (image (3,H,W), aux)."""
    act = activated(params)
    splats = project_gaussians(
        act.means3d, act.scales, act.quats, act.opacities, act.sh, alive,
        cam.viewmat, cam.full_proj, cam.campos, cam.tanfov,
        cfg.img_h, cfg.img_w, sh_degree,
    )
    return render_splats(splats, cfg, bg=bg, tile_mask=tile_mask)


def render_batch(
    params: GaussianParams,
    alive: Array,
    cams: CameraArrays,            # batched (B, ...) leaves
    sh_degree: int,
    cfg: RenderConfig,
    bg: Optional[Array] = None,
    means2d_tap: Optional[Array] = None,   # (B, N, 2) zeros; tap for grad stats
) -> Tuple[Array, ProjectedSplats, RenderAux]:
    """Render a batch of cameras (vmap over the camera axis).

    ``means2d_tap`` is an all-zeros array added to the projected means so the
    training step can read d(loss)/d(means2d) for densification stats — the
    JAX analogue of the reference's ``means2D.retain_grad()``
    (/root/reference/gaussian_renderer/__init__.py:957-958).

    Returns (images (B,3,H,W), batched splats (B,N,...), batched aux).
    """
    act = activated(params)

    def one(cam_vm, cam_fp, cam_cp, cam_tf, tap):
        splats = project_gaussians(
            act.means3d, act.scales, act.quats, act.opacities, act.sh, alive,
            cam_vm, cam_fp, cam_cp, cam_tf,
            cfg.img_h, cfg.img_w, sh_degree,
        )
        if tap is not None:
            splats = splats._replace(means2d=splats.means2d + tap)
        img, aux = render_splats(splats, cfg, bg=bg)
        return img, splats, aux

    if cfg.backend == "pallas":
        # pallas_call + scalar prefetch doesn't compose with vmap; unroll
        # the (small, static) camera batch instead
        b = cams.viewmat.shape[0]
        outs = [
            one(cams.viewmat[i], cams.full_proj[i], cams.campos[i],
                cams.tanfov[i],
                None if means2d_tap is None else means2d_tap[i])
            for i in range(b)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    if means2d_tap is None:
        fn = lambda vm, fp, cp, tf: one(vm, fp, cp, tf, None)
        return jax.vmap(fn)(cams.viewmat, cams.full_proj, cams.campos, cams.tanfov)
    return jax.vmap(one)(
        cams.viewmat, cams.full_proj, cams.campos, cams.tanfov, means2d_tap
    )
