"""Sharded training step: Gaussian parallelism x pixel parallelism on a mesh.

The TPU-native redesign of the reference's live distributed system
(SURVEY.md §2.1-§2.4, /root/reference/gaussian_renderer/__init__.py:542-698,
878-1037, 1217-1291):

  * **Gaussian (model) sharding** — every device owns a contiguous slice of
    the padded capacity axis: params, Adam moments, alive mask and densify
    stats are all sharded with ``P('d')`` (ref --gaussians_distribution).
  * **Pixel/tile sharding** — the tile rows of the batch's images form one
    global row axis (row = cam * tiles_y + ty); each device owns a
    contiguous span given by ``division_pos`` (ref --image_distribution,
    DivisionStrategyFinal). Spans are data, so load rebalancing never
    recompiles.
  * **Sparse all-to-all** — each device projects its local shard for all
    bsz cameras, computes which devices' row spans each visible Gaussian's
    screen bbox touches, packs (means2d | conic | rgb | opacity) into
    fixed-capacity per-destination buckets, and exchanges them with ONE
    differentiable ``lax.all_to_all`` (gradients ride the transpose back to
    the owning shard), plus one non-differentiable all_to_all for
    (camera, radius, depth) metadata — exactly the reference's split
    between its differentiable and plain all2alls
    (gaussian_renderer/__init__.py:587-689).
  * **Sharded loss** — each device renders only its rows and computes
    masked L1 + SSIM normalized by the global pixel count; a psum yields
    the exact global loss (ref final_system_loss_computation,
    loss_distribution.py:2536-2585; SSIM windows see zeros at span borders,
    matching the reference's conv2d zero padding).

Everything below runs under ``jax.jit(shard_map(...))`` over a 1-D device
mesh; per-destination capacities, row-slot counts and isect capacities are
static, retuned by the host at densification boundaries (which already
recompile).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cameras import CameraArrays
from ..engine.train import TrainState, XyzLrSchedule
from ..models.gaussian_model import GaussianParams, activated
from ..models.optimizer import LrConfig, adam_step
from ..models.densify import (
    accumulate_densify_stats,
    densify_and_prune,
    reset_opacity,
)
from ..ops.projection import project_gaussians
from ..ops.isect import (
    compact_entries_blocked,
    compact_entries_flat,
    isect_tile_rows,
)
from ..ops.rasterize_jax import rasterize_slots
from ..ops.ssim import ssim_map

Array = jnp.ndarray

AXIS = "d"
PAYLOAD_F = 9   # means2d(2) + conic(3) + rgb(3) + opacity(1)
META_F = 4      # cam, radius, depth, valid


class ParallelConfig(NamedTuple):
    """Static shape/shard configuration of the distributed step."""

    n_devices: int
    bsz: int
    img_h: int
    img_w: int
    tile_w: int = 16
    tile_h: int = 16
    n_row_slots: int = 0        # per-device row buffer (0 = auto)
    send_cap: int = 0           # per-destination a2a bucket (0 = auto vs N_loc)
    isect_capacity: int = 1 << 18
    # post-cull entry budget (0 = isect_capacity, i.e. no compaction).
    # isect_capacity sizes the EXPANSION (pre-cull rect demand); the
    # corner cull + clipping then sort their drops to the sentinel tail,
    # and every per-index op downstream (payload gather, gradient
    # segment-sum, ~10-13 ns/index each on this chip) runs over the entry
    # axis — so the rasterizer is handed only the first blend_capacity
    # entries. The tuner sizes this from the num_kept telemetry the same
    # way isect_capacity is sized from num_isects.
    blend_capacity: int = 0
    max_per_tile: int = 2048
    chunk: int = 64
    row_slack: float = 2.0      # n_row_slots = slack * ceil(rows / D)
    send_cap_factor: float = 1.0  # send_cap = factor * N_loc
    backend: str = "jax"        # "jax" | "pallas" (TPU kernel)
    # False = replicated Gaussians + dense grad psum (the reference's
    # --gaussians_distribution False legacy-DP mode; pixel sharding stays on)
    gaussians_distribution: bool = True
    # --random_background drawn ON DEVICE from the iteration counter (one
    # bg per step, shared by the batch like the reference's per-iteration
    # torch.rand(3); identical across devices because iteration is
    # replicated). A host-side draw would cost a per-step H2D RPC (~25ms
    # on the tunneled transport).
    random_background: bool = False
    bg_seed: int = 0

    @property
    def tiles_x(self) -> int:
        return -(-self.img_w // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.img_h // self.tile_h)

    @property
    def total_rows(self) -> int:
        return self.bsz * self.tiles_y

    def resolved(self, n_local: int) -> "ParallelConfig":
        out = self
        if out.blend_capacity == 0 or out.blend_capacity > out.isect_capacity:
            out = out._replace(blend_capacity=out.isect_capacity)
        else:
            # rasterizer CHUNK (and camera-block) alignment
            align = 128 * max(1, out.bsz)
            out = out._replace(blend_capacity=min(
                out.isect_capacity, -(-out.blend_capacity // align) * align))
        if out.n_row_slots == 0:
            per = -(-out.total_rows // out.n_devices)
            out = out._replace(
                n_row_slots=min(out.total_rows, int(np.ceil(per * out.row_slack)))
            )
        if out.send_cap == 0:
            out = out._replace(
                send_cap=max(256, int(n_local * out.send_cap_factor))
            )
        return out


# --------------------------------------------------------------------------
# device-local pieces (run inside shard_map)
# --------------------------------------------------------------------------


def _route_pack_exchange(
    means2d: Array,     # (B, N, 2) local screen positions (tap already added)
    conics: Array,      # (B, N, 3)
    rgbs: Array,        # (B, N, 3)
    opacs: Array,       # (B, N)
    radii: Array,       # (B, N) int32
    depths: Array,      # (B, N)
    division_pos: Array,  # (D+1,)
    cfg: ParallelConfig,
):
    """Sparse all-to-all of projected Gaussians (see module docstring).

    Returns (recv_payload (D*C, PAYLOAD_F), recv_meta (D*C, META_F),
    n_send_overflow (), n_send_demand ()). Gradient flows through
    recv_payload back to the packed local tensors; meta is stop-gradient.
    ``n_send_demand`` is the true max per-destination entry count (the
    telemetry the host's send_cap tuner sizes the buckets from).
    """
    d_count = cfg.n_devices
    cap = cfg.send_cap
    b_count, n = means2d.shape[0], means2d.shape[1]
    tiles_y = cfg.tiles_y

    # --- destination device span per (camera, gaussian) ---
    r = radii.astype(jnp.float32)
    vis = radii > 0
    y0 = jnp.clip(jnp.floor((means2d[..., 1] - r) / cfg.tile_h), 0, tiles_y)
    y1 = jnp.clip(
        jnp.floor((means2d[..., 1] + r + cfg.tile_h - 1) / cfg.tile_h),
        0, tiles_y,
    )
    b_idx = jnp.arange(b_count, dtype=jnp.int32)[:, None]
    g0 = (b_idx * tiles_y + y0.astype(jnp.int32))        # (B, N) first row
    g1 = (b_idx * tiles_y + y1.astype(jnp.int32))        # exclusive
    ok = vis & (g1 > g0)
    d0 = jnp.searchsorted(division_pos, g0, side="right").astype(jnp.int32) - 1
    d1 = (
        jnp.searchsorted(division_pos, jnp.maximum(g1 - 1, 0), side="right")
        .astype(jnp.int32) - 1
    )
    n_dest = jnp.where(ok, d1 - d0 + 1, 0)               # (B, N)

    # --- flatten (B, N, D) duplication slots, rank within destination ---
    j = jnp.arange(d_count, dtype=jnp.int32)[None, None, :]
    dest = d0[..., None] + j                              # (B, N, D)
    active = j < n_dest[..., None]
    flat_dest = jnp.where(active, dest, d_count).reshape(-1)   # (E,)
    e_total = flat_dest.shape[0]
    perm = jnp.argsort(flat_dest, stable=True)
    sorted_dest = flat_dest[perm]
    dest_start_full = jnp.searchsorted(
        sorted_dest, jnp.arange(d_count + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    dest_start = dest_start_full[:d_count]
    pos = jnp.arange(e_total, dtype=jnp.int32)
    # start position of each entry's destination segment, broadcast over the
    # sorted axis without a gather (sorted_dest is monotone)
    from ..ops.scan_pallas import cumsum_i32
    seg_start_b = cumsum_i32(
        jnp.zeros((e_total,), jnp.int32).at[dest_start].add(
            jnp.diff(dest_start, prepend=0), mode="drop"))
    rank = pos - seg_start_b
    in_cap = (sorted_dest < d_count) & (rank < cap)
    slot = jnp.where(in_cap, sorted_dest * cap + rank, d_count * cap)

    dest_counts = jnp.diff(dest_start_full)
    n_overflow = jnp.sum(jnp.maximum(dest_counts - cap, 0))
    n_demand = jnp.max(dest_counts)

    # --- gather payload of the (camera, gaussian) behind each flat slot ---
    bi = perm // d_count                                  # index into (B*N)
    payload = jnp.concatenate(
        [
            means2d.reshape(-1, 2),
            conics.reshape(-1, 3),
            rgbs.reshape(-1, 3),
            opacs.reshape(-1, 1),
        ],
        axis=-1,
    )                                                     # (B*N, PAYLOAD_F)
    cam_of = (jnp.arange(b_count * n, dtype=jnp.int32) // n).astype(jnp.float32)
    meta = jnp.stack(
        [
            cam_of,
            radii.reshape(-1).astype(jnp.float32),
            depths.reshape(-1),
            jnp.ones((b_count * n,), jnp.float32),
        ],
        axis=-1,
    )                                                     # (B*N, META_F)

    send_payload = (
        jnp.zeros((d_count * cap, PAYLOAD_F), jnp.float32)
        .at[slot].set(payload[bi], mode="drop")
        .reshape(d_count, cap, PAYLOAD_F)
    )
    send_meta = (
        jnp.zeros((d_count * cap, META_F), jnp.float32)
        .at[slot].set(jax.lax.stop_gradient(meta)[bi], mode="drop")
        .reshape(d_count, cap, META_F)
    )

    # --- the exchange: differentiable payload + plain metadata ---
    recv_payload = jax.lax.all_to_all(
        send_payload, AXIS, split_axis=0, concat_axis=0
    ).reshape(d_count * cap, PAYLOAD_F)
    recv_meta = jax.lax.stop_gradient(
        jax.lax.all_to_all(send_meta, AXIS, split_axis=0, concat_axis=0)
    ).reshape(d_count * cap, META_F)
    return recv_payload, recv_meta, n_overflow, n_demand


def _render_owned_rows(
    recv_payload: Array,   # (M, PAYLOAD_F)
    recv_meta: Array,      # (M, META_F)
    row_lo: Array,
    row_hi: Array,
    cfg: ParallelConfig,
    bg: Array,
):
    """Rasterize the owned tile-row span from received Gaussians.

    Returns (rows (R, 3, tile_h, W), pixel_mask (R, tile_h, W),
    cam_of_row (R,), per_row_entries (R,), num_isects ())."""
    tiles_x, tiles_y = cfg.tiles_x, cfg.tiles_y
    r_slots = cfg.n_row_slots

    means2d = recv_payload[:, 0:2]
    conics = recv_payload[:, 2:5]
    rgbs = recv_payload[:, 5:8]
    opacs = recv_payload[:, 8]
    cams = recv_meta[:, 0].astype(jnp.int32)
    valid = recv_meta[:, 3] > 0
    radii = jnp.where(valid, recv_meta[:, 1], 0.0).astype(jnp.int32)
    depths = jnp.where(valid, recv_meta[:, 2], jnp.inf)

    s = jnp.arange(r_slots * tiles_x, dtype=jnp.int32)
    grow = row_lo + s // tiles_x
    ty = grow % tiles_y
    px0 = (s % tiles_x) * cfg.tile_w
    py0 = ty * cfg.tile_h

    # Single-device: the full row span is owned and the entry universe is
    # camera-major (B*N), so use the camera-BLOCKED entry layout — the
    # backward's Gaussian-gradient reduction then runs per-camera
    # small-accumulator scatters (XLA's TPU scatter degrades ~10x above
    # ~16MB of accumulator; the flat layout paid that at every bsz >= 2).
    blocked = (cfg.n_devices == 1 and cfg.backend == "pallas"
               and r_slots == cfg.bsz * tiles_y
               and means2d.shape[0] % cfg.bsz == 0
               and cfg.isect_capacity % (cfg.bsz * 128) == 0)
    if blocked:
        from ..ops.isect import isect_tile_rows_blocked
        from ..ops.rasterize_pallas import rasterize_slots_pl

        isect = isect_tile_rows_blocked(
            means2d, radii, depths, cfg.bsz,
            cfg.tile_w, cfg.tile_h, tiles_x, tiles_y,
            capacity=cfg.isect_capacity,
            opacities=opacs,
        )
        ids, tlo, thi = isect.gauss_ids, isect.tile_lo, isect.tile_hi
        bb = cfg.blend_capacity
        if bb < cfg.isect_capacity and bb % (cfg.bsz * 128) == 0:
            ids, tlo, thi = compact_entries_blocked(
                ids, tlo, thi, cfg.bsz, tiles_x * tiles_y,
                cfg.isect_capacity // cfg.bsz, bb // cfg.bsz)
        colors, t_final = rasterize_slots_pl(
            means2d, conics, rgbs, opacs,
            ids, None, px0, py0,
            cfg.tile_w, cfg.tile_h, cfg.max_per_tile,
            tile_lo=tlo, tile_hi=thi,
            seg_blocks=cfg.bsz,
        )
        n_per_slot = thi - tlo
    else:
        isect = isect_tile_rows(
            means2d, radii, depths, cams, row_lo, row_hi,
            cfg.tile_w, cfg.tile_h, tiles_x, tiles_y,
            r_slots, cfg.isect_capacity,
            opacities=opacs,
        )
        ids, toff = isect.gauss_ids, isect.tile_offsets
        bb = cfg.blend_capacity
        if bb < cfg.isect_capacity and bb % 128 == 0:
            ids, toff = compact_entries_flat(ids, toff, bb)
        if cfg.backend == "pallas":
            from ..ops.rasterize_pallas import rasterize_slots_pl

            colors, t_final = rasterize_slots_pl(
                means2d, conics, rgbs, opacs,
                ids, toff, px0, py0,
                cfg.tile_w, cfg.tile_h, cfg.max_per_tile,
            )
        else:
            colors, t_final = rasterize_slots(
                means2d, conics, rgbs, opacs,
                ids, toff, px0, py0,
                cfg.tile_w, cfg.tile_h, cfg.max_per_tile, cfg.chunk,
            )
        n_per_slot = toff[1:] - toff[:-1]
    colors = colors + t_final[..., None] * bg[None, None, :]

    # (S, P, 3) -> (R, 3, tile_h, W)
    w_pad = tiles_x * cfg.tile_w
    rows = colors.reshape(r_slots, tiles_x, cfg.tile_h, cfg.tile_w, 3)
    rows = rows.transpose(0, 2, 1, 3, 4).reshape(r_slots, cfg.tile_h, w_pad, 3)
    rows = rows[:, :, : cfg.img_w].transpose(0, 3, 1, 2)

    row_ids = row_lo + jnp.arange(r_slots, dtype=jnp.int32)
    row_valid = row_ids < row_hi
    ty_row = row_ids % tiles_y
    y_global = ty_row[:, None] * cfg.tile_h + jnp.arange(cfg.tile_h)[None, :]
    mask = row_valid[:, None, None] & (y_global < cfg.img_h)[:, :, None]
    mask = jnp.broadcast_to(mask, (r_slots, cfg.tile_h, cfg.img_w))
    cam_of_row = jnp.clip(row_ids // tiles_y, 0, cfg.bsz - 1)

    per_row_entries = n_per_slot.reshape(r_slots, tiles_x).sum(axis=1)
    return (rows, mask, cam_of_row, per_row_entries, isect.num_isects,
            isect.num_kept)


def _row_span_loss(
    rows: Array,        # (R, 3, tile_h, W) rendered
    gt_rows: Array,     # (R, 3, tile_h, W) float
    mask: Array,        # (R, tile_h, W)
    cam_of_row: Array,  # (R,)
    cfg: ParallelConfig,
    lambda_dssim: float,
):
    """Masked partial loss over owned rows (ref loss_distribution.py:2536-2585).

    Returns (partial, l1_partial, ssim_partial): global loss =
    psum(partial) + lambda * bsz; global L1/SSIM sums = psum of partials.
    """
    denom = 3.0 * cfg.img_h * cfg.img_w
    m = mask.astype(jnp.float32)[:, None, :, :]            # (R,1,th,W)
    l1_part = jnp.sum(jnp.abs(rows - gt_rows) * m) / denom

    # Single-pass SSIM over a "gapped tall image": rows are in global order
    # so each camera's rows are vertically contiguous; a zero gap of
    # >= window//2 rows between cameras makes one depthwise conv give every
    # camera exactly the zero-padded border behavior the reference's
    # per-span conv2d has (loss_distribution.py:2553-2576) — without one
    # conv pass per camera.
    gap = 8                       # > 11 // 2
    r_slots = rows.shape[0]
    th, w = cfg.tile_h, cfg.img_w
    tall_h = r_slots * th + cfg.bsz * gap
    slot = jnp.arange(r_slots, dtype=jnp.int32)
    y0 = slot * th + cam_of_row * gap
    y_idx = (y0[:, None] + jnp.arange(th, dtype=jnp.int32)[None, :]).reshape(-1)

    def to_tall(x_r3):            # (R, 3, th, W) -> (3, tall_h, W)
        flat = x_r3.transpose(1, 0, 2, 3).reshape(3, r_slots * th, w)
        return jnp.zeros((3, tall_h, w), jnp.float32).at[:, y_idx, :].set(flat)

    rows_m = rows * m
    gt_m = gt_rows * m
    tall = to_tall(rows_m)
    tall_gt = to_tall(gt_m)
    tall_mask = to_tall(jnp.broadcast_to(m, rows.shape))[0]
    smap = ssim_map(tall, tall_gt)
    ssim_part = jnp.sum(smap * tall_mask[None]) / denom

    partial = (1.0 - lambda_dssim) * l1_part - lambda_dssim * ssim_part
    return partial, l1_part, ssim_part


def _local_forward(
    params_loc: GaussianParams,
    alive_loc: Array,
    tap: Array,                 # (B, N_loc, 2)
    cams: CameraArrays,         # batched (B, ...)
    gt_rows: Array,             # (R, 3, tile_h, W) uint8 (this device's rows)
    division_pos: Array,        # (D+1,)
    bg: Array,
    cfg: ParallelConfig,
    sh_degree: int,
    lambda_dssim: float,
):
    act = activated(params_loc)

    def proj(vm, fp, cp, tf):
        return project_gaussians(
            act.means3d, act.scales, act.quats, act.opacities, act.sh,
            alive_loc, vm, fp, cp, tf, cfg.img_h, cfg.img_w, sh_degree,
        )

    splats = jax.vmap(proj)(cams.viewmat, cams.full_proj, cams.campos, cams.tanfov)
    means2d = splats.means2d + tap

    recv_payload, recv_meta, n_overflow, n_demand = _route_pack_exchange(
        means2d, splats.conics, splats.colors, splats.opacities,
        splats.radii, splats.depths, division_pos, cfg,
    )

    d_idx = jax.lax.axis_index(AXIS)
    row_lo = division_pos[d_idx]
    row_hi = division_pos[d_idx + 1]

    rows, mask, cam_of_row, per_row_entries, num_isects, num_kept = \
        _render_owned_rows(
            recv_payload, recv_meta, row_lo, row_hi, cfg, bg,
        )
    gt = gt_rows.astype(jnp.float32) / 255.0
    partial, l1_part, ssim_part = _row_span_loss(
        rows, gt, mask, cam_of_row, cfg, lambda_dssim,
    )
    aux = {
        "l1_partial": l1_part,
        "ssim_partial": ssim_part,
        "radii": splats.radii,
        "per_row_entries": per_row_entries,
        "num_isects": num_isects,
        "num_kept": num_kept,
        "a2a_overflow": n_overflow,
        "a2a_demand": n_demand,
    }
    return partial, aux


def normalize_grads_by_visibility(
    grads: GaussianParams,
    radii: Array,        # (B, N) int32; > 0 = visible in that view
    mode: str,
) -> GaussianParams:
    """Replicated-mode per-Gaussian gradient normalization by the number of
    batch views the Gaussian is visible in (ref --grad_normalization_mode,
    arguments/__init__.py:157 + gaussian_model.py:364-394 — NB the
    reference computes the visibility-count sum but its application path is
    vestigial; we apply the named semantics). Every device projects the
    full batch in replicated mode, so the count is device-identical and no
    collective is needed."""
    if mode == "none":
        return grads
    vis = jnp.sum(radii > 0, axis=0).astype(jnp.float32)       # (N,)
    if mode == "divide_by_visible_count":
        factor = 1.0 / jnp.maximum(vis, 1.0)
    elif mode == "multiply_by_visible_count":
        factor = vis
    elif mode == "square_multiply_by_visible_count":
        factor = vis * vis
    else:
        raise ValueError(f"unknown grad_normalization_mode {mode!r}")
    return jax.tree.map(
        lambda g: g * factor.reshape((-1,) + (1,) * (g.ndim - 1)), grads)


# --------------------------------------------------------------------------
# the sharded trainer
# --------------------------------------------------------------------------


def _state_specs(replicated: bool = False) -> TrainState:
    """PartitionSpec pytree for TrainState (capacity axis sharded, or fully
    replicated for the legacy-DP mode)."""
    ax = P() if replicated else P(AXIS)
    p_params = GaussianParams(*(ax for _ in GaussianParams._fields))
    from ..models.optimizer import AdamState
    from ..models.densify import DensifyStats

    return TrainState(
        params=p_params,
        alive=ax,
        adam=AdamState(mu=p_params, nu=p_params, count=P()),
        stats=DensifyStats(grad_accum=ax, denom=ax, max_radii=ax),
        iteration=P(),
    )


def _local_forward_replicated(
    params: GaussianParams,
    alive: Array,
    tap: Array,                 # (B, N, 2)
    cams: CameraArrays,
    gt_rows: Array,
    division_pos: Array,
    bg: Array,
    cfg: ParallelConfig,
    sh_degree: int,
    lambda_dssim: float,
):
    """Replicated-Gaussian forward: every device projects the FULL set and
    renders its own row span — no all-to-all (ref legacy DP mode)."""
    act = activated(params)

    def proj(vm, fp, cp, tf):
        return project_gaussians(
            act.means3d, act.scales, act.quats, act.opacities, act.sh,
            alive, vm, fp, cp, tf, cfg.img_h, cfg.img_w, sh_degree,
        )

    splats = jax.vmap(proj)(cams.viewmat, cams.full_proj, cams.campos,
                            cams.tanfov)
    b, n = splats.radii.shape
    means2d = (splats.means2d + tap).reshape(b * n, 2)
    payload = jnp.concatenate(
        [means2d, splats.conics.reshape(-1, 3), splats.colors.reshape(-1, 3),
         splats.opacities.reshape(-1, 1)], axis=-1)
    cam_of = (jnp.arange(b * n, dtype=jnp.int32) // n).astype(jnp.float32)
    meta = jnp.stack(
        [cam_of, splats.radii.reshape(-1).astype(jnp.float32),
         splats.depths.reshape(-1), jnp.ones((b * n,), jnp.float32)], axis=-1)

    d_idx = jax.lax.axis_index(AXIS)
    row_lo = division_pos[d_idx]
    row_hi = division_pos[d_idx + 1]
    rows, mask, cam_of_row, per_row_entries, num_isects, num_kept = \
        _render_owned_rows(
            payload, jax.lax.stop_gradient(meta), row_lo, row_hi, cfg, bg,
        )
    gt = gt_rows.astype(jnp.float32) / 255.0
    partial, l1_part, ssim_part = _row_span_loss(
        rows, gt, mask, cam_of_row, cfg, lambda_dssim,
    )
    aux = {
        "l1_partial": l1_part,
        "ssim_partial": ssim_part,
        "radii": splats.radii,
        "per_row_entries": per_row_entries,
        "num_isects": num_isects,
        "num_kept": num_kept,
        "a2a_overflow": jnp.zeros((), jnp.int32),
        "a2a_demand": jnp.zeros((), jnp.int32),
    }
    return partial, aux


class ShardedTrainer:
    """Compiles and runs the distributed train/eval steps on a mesh."""

    def __init__(
        self,
        mesh: Mesh,
        cfg: ParallelConfig,
        sh_degree: int,
        lambda_dssim: float,
        lrs: LrConfig,
        xyz_sched: XyzLrSchedule,
        lr_scale_mode: str = "sqrt",
        lr_scale_loss: float = 1.0,
        grad_normalization_mode: str = "none",
    ):
        self.mesh = mesh
        self.cfg = cfg
        self.sh_degree = sh_degree
        self.lambda_dssim = lambda_dssim
        self.lrs = lrs
        self.xyz_sched = xyz_sched
        self.lr_scale_mode = lr_scale_mode
        self.lr_scale_loss = lr_scale_loss
        self.grad_normalization_mode = grad_normalization_mode
        # reserved HBM bytes of the compiled step (temp+args+outs), filled
        # from XLA's memory analysis after the first execution — see
        # utils/hbm.py (the runtime's memory_stats can be empty on TPU)
        self.mem_bytes = None
        self._build()

    # -- sharding helpers --------------------------------------------------

    def shard_state(self, state: TrainState) -> TrainState:
        specs = _state_specs(not self.cfg.gaussians_distribution)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            state, specs,
        )

    def sharding_for(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    # -- step construction -------------------------------------------------

    def _build(self):
        cfg = self.cfg
        sh_degree = self.sh_degree
        lambda_dssim = self.lambda_dssim
        lrs = self.lrs
        sched = self.xyz_sched
        lr_scale_mode = self.lr_scale_mode
        lr_scale_loss = self.lr_scale_loss
        grad_norm_mode = self.grad_normalization_mode
        bsz = cfg.bsz

        cam_spec = CameraArrays(viewmat=P(), full_proj=P(), campos=P(), tanfov=P())
        replicated = not cfg.gaussians_distribution
        state_spec = _state_specs(replicated)
        forward = _local_forward_replicated if replicated else _local_forward

        def step_shard(state: TrainState, cams, gt_rows, division_pos, bg):
            gt_local = gt_rows[0]          # (1, R, ...) -> (R, ...)
            if cfg.random_background:
                # one bg per step shared by the batch, derived from the
                # replicated iteration counter on device (ref draws one
                # torch.rand(3) per iteration under identical per-rank
                # seeding, train_internal.py; a host-side draw was a
                # ~25ms-per-step H2D RPC on the tunneled transport)
                bg = jax.random.uniform(
                    jax.random.fold_in(jax.random.key(cfg.bg_seed),
                                       state.iteration),
                    (3,), jnp.float32)

            def loss_fn(params_loc, tap):
                partial, aux = forward(
                    params_loc, state.alive, tap, cams, gt_local,
                    division_pos, bg, cfg, sh_degree, lambda_dssim,
                )
                # ref: loss_sum * args.lr_scale_loss (loss_distribution.py:2634)
                total = (jax.lax.psum(partial, AXIS)
                         + lambda_dssim * bsz) * lr_scale_loss
                return total, aux

            n_loc = state.alive.shape[0]
            tap = jnp.zeros((bsz, n_loc, 2), jnp.float32)
            (loss, aux), (grads, tap_grad) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, tap)

            if replicated:
                # dense gradient sync (ref sync_gradients_densely,
                # gaussian_model.py:1350-1439): each device's backward only
                # covers its own pixel rows
                grads = jax.lax.psum(grads, AXIS)
                tap_grad = jax.lax.psum(tap_grad, AXIS)
                # tap_grad stays raw: densify stats use the un-normalized
                # means2d gradient (ref add_densification_stats,
                # gaussian_model.py:1046-1064)
                grads = normalize_grads_by_visibility(
                    grads, aux["radii"], grad_norm_mode)

            if lr_scale_mode != "accumu":
                grads = jax.tree.map(lambda g: g / bsz, grads)

            stats = accumulate_densify_stats(
                state.stats, tap_grad, aux["radii"], cfg.img_w, cfg.img_h
            )
            xyz_lr = sched(state.iteration)
            params, adam = adam_step(
                state.params, grads, state.adam, lrs, xyz_lr, state.alive
            )
            new_state = TrainState(
                params=params, alive=state.alive, adam=adam, stats=stats,
                iteration=state.iteration + bsz,
            )
            # per-device telemetry is all-gathered to every device (bytes:
            # D*R ints — negligible) so the host balancer/tuner reads a
            # REPLICATED array; under multi-host each process can only
            # device_get fully-replicated values, and every host needs the
            # full cost picture to compute the same division_pos anyway
            num_isects_g = jax.lax.all_gather(aux["num_isects"], AXIS)
            num_kept_g = jax.lax.all_gather(aux["num_kept"], AXIS)
            overflow_g = jax.lax.all_gather(aux["a2a_overflow"], AXIS)
            demand_g = jax.lax.all_gather(aux["a2a_demand"], AXIS)
            metrics = {
                "loss": loss,
                "l1": jax.lax.psum(aux["l1_partial"], AXIS),
                "ssim": jax.lax.psum(aux["ssim_partial"], AXIS),
                "per_row_entries": jax.lax.all_gather(
                    aux["per_row_entries"], AXIS),                 # (D, R)
                "num_isects": num_isects_g,                        # (D,)
                "num_kept": num_kept_g,                            # (D,)
                "a2a_overflow": overflow_g,                        # (D,)
                "a2a_demand": demand_g,                            # (D,)
                # packed copy of (num_isects | a2a_overflow | a2a_demand |
                # num_kept): the host tuner reads telemetry EVERY step, and
                # on a tunneled transport each device_get is a ~25ms RPC —
                # one packed fetch instead of four
                "telemetry": jnp.concatenate(
                    [num_isects_g.astype(jnp.float32),
                     overflow_g.astype(jnp.float32),
                     demand_g.astype(jnp.float32),
                     num_kept_g.astype(jnp.float32)]),             # (4D,)
                "xyz_lr": xyz_lr,
            }
            return new_state, metrics

        metrics_spec = {
            "loss": P(), "l1": P(), "ssim": P(),
            "per_row_entries": P(), "num_isects": P(), "num_kept": P(),
            "a2a_overflow": P(), "a2a_demand": P(),
            "telemetry": P(), "xyz_lr": P(),
        }

        self._step = jax.jit(shard_map(
            step_shard,
            mesh=self.mesh,
            in_specs=(state_spec, cam_spec, P(AXIS), P(), P()),
            out_specs=(state_spec, metrics_spec),
            check_vma=False,
        ))

        # ---- eval: render full images, assemble with psum ----
        def render_shard(params, alive, cams, division_pos, bg):
            act = activated(params)

            def proj(vm, fp, cp, tf):
                return project_gaussians(
                    act.means3d, act.scales, act.quats, act.opacities, act.sh,
                    alive, vm, fp, cp, tf, cfg.img_h, cfg.img_w, sh_degree,
                )

            splats = jax.vmap(proj)(
                cams.viewmat, cams.full_proj, cams.campos, cams.tanfov
            )
            if replicated:
                b, n = splats.radii.shape
                recv_payload = jnp.concatenate(
                    [splats.means2d.reshape(-1, 2),
                     splats.conics.reshape(-1, 3),
                     splats.colors.reshape(-1, 3),
                     splats.opacities.reshape(-1, 1)], axis=-1)
                cam_of = (jnp.arange(b * n, dtype=jnp.int32) // n).astype(
                    jnp.float32)
                recv_meta = jnp.stack(
                    [cam_of, splats.radii.reshape(-1).astype(jnp.float32),
                     splats.depths.reshape(-1),
                     jnp.ones((b * n,), jnp.float32)], axis=-1)
            else:
                recv_payload, recv_meta, _, _ = _route_pack_exchange(
                    splats.means2d, splats.conics, splats.colors,
                    splats.opacities, splats.radii, splats.depths,
                    division_pos, cfg,
                )
            d_idx = jax.lax.axis_index(AXIS)
            row_lo = division_pos[d_idx]
            row_hi = division_pos[d_idx + 1]
            rows, mask, cam_of_row, _, _, _ = _render_owned_rows(
                recv_payload, recv_meta, row_lo, row_hi, cfg, bg,
            )
            rows = rows * mask[:, None, :, :]
            # scatter rows into the batch image stack, then sum across devices
            tiles_y = cfg.tiles_y
            row_ids = row_lo + jnp.arange(cfg.n_row_slots, dtype=jnp.int32)
            ty = row_ids % tiles_y
            b_of = jnp.where(row_ids < row_hi, row_ids // tiles_y, bsz)
            imgs = jnp.zeros(
                (bsz, 3, tiles_y, cfg.tile_h, cfg.img_w), jnp.float32
            )
            # advanced indices at axes 0 and 2 (slice between) -> update
            # selection shape (R, 3, tile_h, W), matching `rows`
            imgs = imgs.at[b_of, :, ty].set(rows, mode="drop")
            imgs = imgs.reshape(bsz, 3, tiles_y * cfg.tile_h, cfg.img_w)
            imgs = jax.lax.psum(imgs, AXIS)
            return imgs[:, :, : cfg.img_h, :]

        ax = P() if replicated else P(AXIS)
        self._render = jax.jit(shard_map(
            render_shard,
            mesh=self.mesh,
            in_specs=(
                GaussianParams(*(ax for _ in GaussianParams._fields)),
                ax, cam_spec, P(), P(),
            ),
            out_specs=P(),
            check_vma=False,
        ))

        # ---- per-shard densification (local, no comm) ----
        p_params = GaussianParams(*(ax for _ in GaussianParams._fields))
        from ..models.optimizer import AdamState as _AS
        from ..models.densify import DensifyStats as _DS

        adam_spec = _AS(mu=p_params, nu=p_params, count=P())
        stats_spec = _DS(grad_accum=ax, denom=ax, max_radii=ax)
        self._densify_cache = {}

        def build_densify(use_size_prune: bool):
            def densify_shard(params, alive, adam, stats, key, grad_threshold,
                              min_opacity, extent, percent_dense):
                if not replicated:
                    # per-shard free-slot allocation needs independent
                    # randomness; replicated mode must stay identical
                    # across devices
                    key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
                p, a, ad, st, info = densify_and_prune(
                    params, alive, adam, stats, key,
                    grad_threshold, min_opacity, extent, percent_dense,
                    use_size_prune,
                )
                info_arr = jnp.stack(
                    [info.n_cloned, info.n_split, info.n_pruned,
                     info.n_dropped, info.n_alive]
                ).astype(jnp.int32)            # (5,)
                # all-gather to REPLICATED (D, 5): under multi-host every
                # process must be able to fetch the full info table (a
                # P('d')-sharded output spans non-addressable devices)
                info_rep = jax.lax.all_gather(info_arr, AXIS)
                return p, a, ad, st, info_rep

            return jax.jit(shard_map(
                densify_shard,
                mesh=self.mesh,
                in_specs=(p_params, ax, adam_spec, stats_spec,
                          P(), P(), P(), P(), P()),
                out_specs=(p_params, ax, adam_spec, stats_spec, P()),
                check_vma=False,
            ))

        self._build_densify = build_densify

        def reset_opacity_shard(params, adam):
            return reset_opacity(params, adam)

        self._reset_opacity = jax.jit(shard_map(
            reset_opacity_shard,
            mesh=self.mesh,
            in_specs=(p_params, adam_spec),
            out_specs=(p_params, adam_spec),
            check_vma=False,
        ))

    # -- public API --------------------------------------------------------

    def step(self, state: TrainState, cams: CameraArrays, gt_rows: Array,
             division_pos: Array, bg: Array):
        """One distributed training step.

        gt_rows: (D, R, 3, tile_h, W) uint8 — device d's slice at index d
        (shard with ``sharding_for(P('d'))`` for zero-copy placement).
        """
        out = self._step(state, cams, gt_rows, division_pos, bg)
        if self.mem_bytes is None:
            import jax

            if jax.process_count() > 1:
                # multi-controller: re-entering lower/compile outside the
                # shared step schedule can desynchronize the processes
                # (observed: 2-process CPU run deadlocks at the first
                # step); pod slices report real memory_stats, so the
                # XLA-memory-analysis fallback is single-process only
                self.mem_bytes = 0
            else:
                from ..utils.hbm import compiled_bytes

                # resolves from the executable cache now that the step ran
                self.mem_bytes = compiled_bytes(
                    self._step, state, cams, gt_rows, division_pos, bg) or 0
        return out

    def render(self, params: GaussianParams, alive: Array, cams: CameraArrays,
               division_pos: Array, bg: Array) -> Array:
        """Distributed eval render: full (B, 3, H, W) images (replicated)."""
        return self._render(params, alive, cams, division_pos, bg)

    def densify(self, state: TrainState, key, grad_threshold: float,
                min_opacity: float, extent: float, percent_dense: float,
                use_size_prune: bool):
        use_size_prune = bool(use_size_prune)
        if use_size_prune not in self._densify_cache:
            self._densify_cache[use_size_prune] = self._build_densify(
                use_size_prune)
        p, a, ad, st, info = self._densify_cache[use_size_prune](
            state.params, state.alive, state.adam, state.stats, key,
            grad_threshold, min_opacity, extent, percent_dense,
        )
        return (
            TrainState(params=p, alive=a, adam=ad, stats=st,
                       iteration=state.iteration),
            np.asarray(info),   # (D, 5): cloned, split, pruned, dropped, alive
        )

    def reset_opacity(self, state: TrainState) -> TrainState:
        p, ad = self._reset_opacity(state.params, state.adam)
        return state._replace(params=p, adam=ad)
