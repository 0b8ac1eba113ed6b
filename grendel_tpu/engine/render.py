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
    # post-cull blend budget PER CAMERA (0 = isect_capacity: no
    # compaction). See parallel/sharded.py ParallelConfig.blend_capacity —
    # the corner cull's sentinel tail otherwise rides through the
    # per-index payload gather + gradient segment-sum at full capacity.
    blend_capacity: int = 0
    max_per_tile: int = 2048
    chunk: int = 64
    backend: str = "jax"   # "jax" | "pallas" | "pallas_interpret" (tests)

    @property
    def blend_cap(self) -> int:
        bb = self.blend_capacity
        if bb <= 0 or bb >= self.isect_capacity or bb % 128:
            return self.isect_capacity
        return bb

    @property
    def use_pallas(self) -> bool:
        return self.backend.startswith("pallas")

    @property
    def pallas_interpret(self) -> bool:
        return self.backend == "pallas_interpret"

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
        opacities=splats.opacities,
    )
    if cfg.use_pallas:
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

    ids, toff = isect.gauss_ids, isect.tile_offsets
    if cfg.blend_cap < cfg.isect_capacity:
        from ..ops.isect import compact_entries_flat

        ids, toff = compact_entries_flat(ids, toff, cfg.blend_cap)
    colors, t_final = rasterize_slots_pl(
        splats.means2d, splats.conics, splats.colors, splats.opacities,
        ids, toff, slot_px0, slot_py0,
        cfg.tile_w, cfg.tile_h, cfg.max_per_tile,
        interpret=cfg.pallas_interpret,
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


def _render_batch_rowslots(act, alive, cams, sh_degree, cfg: RenderConfig,
                           bg, means2d_tap):
    """Whole-batch rasterization on the row-slot formulation.

    pallas_call + scalar prefetch doesn't compose with vmap, and unrolling
    the camera batch paid per-camera isect + kernel overheads (the
    reference's bsz>1 win comes precisely from batching the tile lists:
    SURVEY.md §2.2 flattened (camera, tile-row) axis). Instead, flatten the
    batch into one (B*N) entry universe and one slot space of
    B * tiles_y * tiles_x tiles — a single isect + a single kernel launch.
    The entry list is camera-BLOCKED (cfg.isect_capacity entries per
    camera, static offsets): each camera keeps its own overflow budget and
    the backward's Gaussian-gradient reduction runs per-camera scatters
    into small accumulators (XLA's TPU scatter falls off a ~10x cliff
    above ~16MB of accumulator — the flat layout paid that at every
    bsz >= 2).
    """
    from ..ops.isect import isect_tile_rows_blocked
    from ..ops.rasterize_pallas import rasterize_slots_pl

    if bg is None:
        bg = jnp.zeros(3, dtype=jnp.float32)
    b = cams.viewmat.shape[0]
    n = act.means3d.shape[0]
    tiles_x, tiles_y = cfg.tiles_x, cfg.tiles_y

    def proj(vm, fp, cp, tf):
        return project_gaussians(
            act.means3d, act.scales, act.quats, act.opacities, act.sh,
            alive, vm, fp, cp, tf, cfg.img_h, cfg.img_w, sh_degree,
        )

    splats = jax.vmap(proj)(cams.viewmat, cams.full_proj, cams.campos,
                            cams.tanfov)
    if means2d_tap is not None:
        splats = splats._replace(means2d=splats.means2d + means2d_tap)

    flat = jax.tree.map(lambda x: x.reshape((b * n,) + x.shape[2:]), splats)
    r = b * tiles_y
    isect = isect_tile_rows_blocked(
        flat.means2d, flat.radii, flat.depths, b,
        cfg.tile_w, cfg.tile_h, tiles_x, tiles_y,
        capacity=b * cfg.isect_capacity,
        opacities=flat.opacities,
    )

    s = jnp.arange(r * tiles_x, dtype=jnp.int32)
    px0 = (s % tiles_x) * cfg.tile_w
    py0 = ((s // tiles_x) % tiles_y) * cfg.tile_h
    ids, tlo, thi = isect.gauss_ids, isect.tile_lo, isect.tile_hi
    if cfg.blend_cap < cfg.isect_capacity:
        from ..ops.isect import compact_entries_blocked

        ids, tlo, thi = compact_entries_blocked(
            ids, tlo, thi, b, tiles_x * tiles_y,
            cfg.isect_capacity, cfg.blend_cap)
    colors, t_final = rasterize_slots_pl(
        flat.means2d, flat.conics, flat.colors, flat.opacities,
        ids, None, px0, py0,
        cfg.tile_w, cfg.tile_h, cfg.max_per_tile,
        interpret=cfg.pallas_interpret,
        tile_lo=tlo, tile_hi=thi, seg_blocks=b,
    )
    colors = colors + t_final[..., None] * bg[None, None, :]

    th, tw = cfg.tile_h, cfg.tile_w
    img = colors.reshape(b, tiles_y, tiles_x, th, tw, 3)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, tiles_y * th, tiles_x * tw, 3)
    img = img[:, : cfg.img_h, : cfg.img_w].transpose(0, 3, 1, 2)
    tmap = t_final.reshape(b, tiles_y, tiles_x, th, tw)
    tmap = tmap.transpose(0, 1, 3, 2, 4).reshape(
        b, tiles_y * th, tiles_x * tw)
    tmap = tmap[:, : cfg.img_h, : cfg.img_w]
    n_entries = (isect.tile_hi - isect.tile_lo).reshape(
        b, tiles_y * tiles_x)
    aux = RenderAux(
        final_t=tmap,
        n_entries=n_entries,
        num_isects=jnp.broadcast_to(isect.num_isects, (b,)),
    )
    return img, splats, aux


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

    if cfg.use_pallas:
        return _render_batch_rowslots(act, alive, cams, sh_degree, cfg,
                                      bg, means2d_tap)
    if means2d_tap is None:
        fn = lambda vm, fp, cp, tf: one(vm, fp, cp, tf, None)
        return jax.vmap(fn)(cams.viewmat, cams.full_proj, cams.campos, cams.tanfov)
    return jax.vmap(one)(
        cams.viewmat, cams.full_proj, cams.campos, cams.tanfov, means2d_tap
    )
