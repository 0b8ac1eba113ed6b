"""Densification, pruning and opacity reset on padded-capacity state.

Behavioral contract (ref: /root/reference/scene/gaussian_model.py:900-1064
and densification.py:5-85):

  * per-iteration stats: accumulate ||d(means2d)[:2]|| over visible
    Gaussians (radii > 0) and a visibility denominator; track max 2D radius;
  * every densification_interval in (densify_from_iter, densify_until_iter]:
      clone  — avg grad >= threshold and max scale <= percent_dense * extent:
               copy the Gaussian as-is (optimizer moments of the copy = 0);
      split  — avg grad >= threshold and max scale >  percent_dense * extent:
               replace with N=2 children sampled from the parent Gaussian
               (position = parent + R @ Normal(0, scales), scales /= 1.6),
               children get zero optimizer moments;
      prune  — opacity < min_opacity, plus (after the first opacity reset)
               world-space size > 0.1 * extent. (The reference's screen-size
               prune is dead code — max_radii2D is asserted all-zero,
               gaussian_model.py:1030-1037 — so it is not reproduced.)
  * opacity reset — clamp opacity to <= 0.01 and zero its Adam moments
    (ref: gaussian_model.py:555-561 + replace_tensor_to_optimizer).

TPU design: instead of the reference's dynamic concat/index "optimizer
state surgery", everything is a fixed-shape masked scatter into dead slots:
pruned slots become free, split children/clone copies are placed into free
slots via rank-into-free-list addressing, and overflow (more new Gaussians
than free slots) is *dropped and reported* so the host can grow capacity
(a controlled recompile) before the next densification.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .gaussian_model import GaussianParams
from .optimizer import AdamState
from ..utils.math3d import quat_rotmat_entries, inverse_sigmoid

Array = jnp.ndarray

SPLIT_N = 2                    # children per split (ref default N=2)
SPLIT_SCALE_DIV = 0.8 * SPLIT_N  # children scale divisor (ref: 1.6)
WS_PRUNE_COEFF = 0.1           # world-size prune: scale > 0.1 * extent


class DensifyStats(NamedTuple):
    grad_accum: Array   # (N,) accumulated screen-space grad norms
    denom: Array        # (N,) visibility count
    max_radii: Array    # (N,) max screen radius seen (kept for parity/telemetry)


class DensifyInfo(NamedTuple):
    n_cloned: Array
    n_split: Array
    n_pruned: Array
    n_dropped: Array    # new Gaussians that did not fit in capacity
    n_alive: Array


def densify_stats_init(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(grad_accum=z, denom=z, max_radii=z)


def accumulate_densify_stats(
    stats: DensifyStats,
    means2d_grad: Array,   # (B, N, 2) d(loss)/d(means2d) per camera, PIXEL space
    radii: Array,          # (B, N) int32 — 0 = not visible in that camera
    img_w: int,
    img_h: int,
) -> DensifyStats:
    """Add one batch's screen-space gradient stats (ref:
    gaussian_model.py:1046-1064 + densification.py:16-25).

    Our projected means2d are in pixel units; the reference convention that
    the default ``densify_grad_threshold=0.0002`` assumes is gradients w.r.t.
    NDC-half-extent units — the reference's gsplat path converts explicitly
    by multiplying pixel grads with (0.5*width, 0.5*height)
    (gaussian_model.py:1054-1064), and the CUDA rasterizer returns grads in
    that scale natively. Scale before the norm so thresholds are portable.
    """
    visible = radii > 0                                    # (B, N)
    scale = jnp.asarray([0.5 * img_w, 0.5 * img_h], jnp.float32)
    norms = jnp.linalg.norm(means2d_grad * scale, axis=-1)  # (B, N)
    return DensifyStats(
        grad_accum=stats.grad_accum + jnp.sum(jnp.where(visible, norms, 0.0), axis=0),
        denom=stats.denom + jnp.sum(visible, axis=0).astype(jnp.float32),
        max_radii=jnp.maximum(stats.max_radii,
                              jnp.max(radii, axis=0).astype(jnp.float32)),
    )


def densify_and_prune(
    params: GaussianParams,
    alive: Array,
    adam: AdamState,
    stats: DensifyStats,
    key: Array,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    use_size_prune: bool,
) -> Tuple[GaussianParams, Array, AdamState, DensifyStats, DensifyInfo]:
    """One densify/prune pass. Fully jittable; ``use_size_prune`` is static."""
    n = alive.shape[0]
    grads = jnp.where(stats.denom > 0, stats.grad_accum / stats.denom, 0.0)
    opac = jax.nn.sigmoid(params.opacities_raw)
    scales = jnp.exp(params.scales_raw)
    max_scale = jnp.max(scales, axis=-1)

    keep = alive & (opac >= min_opacity)
    if use_size_prune:
        keep = keep & ~(max_scale > WS_PRUNE_COEFF * extent)
    n_pruned = jnp.sum(alive) - jnp.sum(keep)

    grad_cond = grads >= grad_threshold
    big = max_scale > percent_dense * extent
    clone_mask = keep & grad_cond & ~big
    split_mask = keep & grad_cond & big
    n_clones = jnp.sum(clone_mask)
    n_splits = jnp.sum(split_mask)

    alive_new = keep
    n_free = n - jnp.sum(alive_new)

    # Free-slot addressing: stable argsort puts dead slots first in index order.
    free_order = jnp.argsort(alive_new)                   # (n,) dead slots first

    # Enumerate new items: clones first, then split-child2s.
    clone_rank = jnp.cumsum(clone_mask) - 1
    split_rank = jnp.cumsum(split_mask) - 1
    child2_rank = n_clones + split_rank

    def dst_for(mask, rank):
        ok = mask & (rank < n_free)
        slot = free_order[jnp.clip(rank, 0, n - 1)]
        return jnp.where(ok, slot, n)                     # n => out-of-bounds drop

    dst_clone = dst_for(clone_mask, clone_rank)
    dst_child2 = dst_for(split_mask, child2_rank)
    n_dropped = (n_clones + n_splits) - (
        jnp.sum(dst_clone < n) + jnp.sum(dst_child2 < n)
    )

    # Split children: position sampled from the parent Gaussian, scale / 1.6.
    # Component-form rotation (an (n,3,3) rotmat array tiles to (4,128) on
    # TPU — a 56.9x padding blow-up at multi-million capacities).
    samples = jax.random.normal(key, (n, SPLIT_N, 3)) * scales[:, None, :]
    r = quat_rotmat_entries(params.quats)                 # 9 x (n,)
    offsets = jnp.stack(
        [
            r[0][:, None] * samples[..., 0] + r[1][:, None] * samples[..., 1]
            + r[2][:, None] * samples[..., 2],
            r[3][:, None] * samples[..., 0] + r[4][:, None] * samples[..., 1]
            + r[5][:, None] * samples[..., 2],
            r[6][:, None] * samples[..., 0] + r[7][:, None] * samples[..., 1]
            + r[8][:, None] * samples[..., 2],
        ],
        axis=-1,
    )                                                     # (n, SPLIT_N, 3)
    child_xyz = params.means3d[:, None, :] + offsets      # (n, SPLIT_N, 3)
    child_scales_raw = params.scales_raw - jnp.log(SPLIT_SCALE_DIV)

    def child_params(which: int) -> GaussianParams:
        return params._replace(
            means3d=child_xyz[:, which, :], scales_raw=child_scales_raw
        )

    child1 = child_params(0)
    child2 = child_params(1)

    # 1) child1 overwrites the parent slot in place.
    def inplace(leaf_old, leaf_child):
        mask = split_mask.reshape((-1,) + (1,) * (leaf_old.ndim - 1))
        return jnp.where(mask, leaf_child, leaf_old)

    out = GaussianParams(*(inplace(o, c) for o, c in zip(params, child1)))

    # 2) scatter clones (parent values) and child2s into free slots.
    def scatter(leaf, src_clone, src_child2):
        leaf = leaf.at[dst_clone].set(src_clone, mode="drop")
        return leaf.at[dst_child2].set(src_child2, mode="drop")

    out = GaussianParams(
        *(scatter(l, pc, c2) for l, pc, c2 in zip(out, params, child2))
    )

    alive_new = alive_new.at[dst_clone].set(True, mode="drop")
    alive_new = alive_new.at[dst_child2].set(True, mode="drop")

    # 3) optimizer-state surgery: zero moments of split parents (now child1)
    #    and of every newly-populated slot (ref appends zeros,
    #    gaussian_model.py:837-882).
    def zero_moments(leaf):
        mask = split_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        leaf = jnp.where(mask, 0.0, leaf)
        zeros = jnp.zeros_like(leaf)
        leaf = leaf.at[dst_clone].set(zeros, mode="drop")
        return leaf.at[dst_child2].set(zeros, mode="drop")

    adam_new = AdamState(
        mu=GaussianParams(*(zero_moments(l) for l in adam.mu)),
        nu=GaussianParams(*(zero_moments(l) for l in adam.nu)),
        count=adam.count,
    )

    info = DensifyInfo(
        n_cloned=n_clones,
        n_split=n_splits,
        n_pruned=n_pruned,
        n_dropped=n_dropped,
        n_alive=jnp.sum(alive_new),
    )
    # Stats reset after every densification (ref: densification_postfix
    # re-creates zero accumulators, gaussian_model.py:911-916).
    return out, alive_new, adam_new, densify_stats_init(n), info


def reset_opacity(
    params: GaussianParams, adam: AdamState, ceiling: float = 0.01
) -> Tuple[GaussianParams, AdamState]:
    """Clamp opacity to <= ceiling and zero its Adam moments (ref:
    gaussian_model.py:555-561)."""
    opac = jax.nn.sigmoid(params.opacities_raw)
    new_raw = inverse_sigmoid(jnp.minimum(opac, ceiling))
    new_params = params._replace(opacities_raw=new_raw)
    adam_new = AdamState(
        mu=adam.mu._replace(opacities_raw=jnp.zeros_like(adam.mu.opacities_raw)),
        nu=adam.nu._replace(opacities_raw=jnp.zeros_like(adam.nu.opacities_raw)),
        count=adam.count,
    )
    return new_params, adam_new
