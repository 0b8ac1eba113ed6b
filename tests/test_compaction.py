"""Post-cull blend-capacity compaction is output- AND gradient-invariant.

The isect stage's corner cull / clipping sort their drops to the sentinel
tail of the entry axis; compaction (parallel/sharded.py
compact_entries_{flat,blocked}) hands the rasterizer only the surviving
prefix so the per-index payload gather and gradient segment-sum (~10-13
ns/index on TPU, VERDICT r4 #2) stop paying for dead entries. Slicing
sentinels must change NOTHING: forward bitwise, gradients bitwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grendel_tpu.ops.isect import isect_tiles, isect_tile_rows_blocked
from grendel_tpu.ops.rasterize_jax import rasterize_slots
from grendel_tpu.ops.rasterize_pallas import rasterize_slots_pl
from grendel_tpu.parallel.sharded import (
    compact_entries_blocked, compact_entries_flat,
)
from grendel_tpu.testing import make_test_camera, project_test_scene

TILE = 16


def _align(n, m=128):
    return -(-n // m) * m


def test_flat_compaction_forward_and_grad_bitwise():
    cam = make_test_camera(width=64, height=48)
    _, s = project_test_scene(jax.random.PRNGKey(3), 400, cam)
    tx, ty = -(-64 // TILE), -(-48 // TILE)
    cap = 4096
    isect = isect_tiles(s.means2d, s.radii, s.depths, TILE, TILE, tx, ty,
                        capacity=cap, opacities=s.opacities)
    kept = int(isect.num_kept)
    assert 0 < kept < cap, "scene must leave sentinel slack to compact"
    bb = _align(kept)
    t_ids = jnp.arange(tx * ty, dtype=jnp.int32)
    px0, py0 = (t_ids % tx) * TILE, (t_ids // tx) * TILE

    def run(ids, toff, m2d):
        col, t = rasterize_slots(
            m2d, s.conics, s.colors, s.opacities, ids, toff, px0, py0,
            TILE, TILE, 256, 64)
        return col, t

    ids_c, toff_c = compact_entries_flat(isect.gauss_ids,
                                         isect.tile_offsets, bb)
    col_f, t_f = run(isect.gauss_ids, isect.tile_offsets, s.means2d)
    col_c, t_c = run(ids_c, toff_c, s.means2d)
    np.testing.assert_array_equal(np.asarray(col_f), np.asarray(col_c))
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_c))

    def loss(ids, toff):
        def f(m2d):
            col, t = run(ids, toff, m2d)
            return jnp.sum(col * col) + jnp.sum(t)
        return jax.grad(f)(s.means2d)

    g_f = loss(isect.gauss_ids, isect.tile_offsets)
    g_c = loss(ids_c, toff_c)
    np.testing.assert_array_equal(np.asarray(g_f), np.asarray(g_c))


def test_blocked_compaction_forward_and_grad_bitwise():
    cams = [make_test_camera(width=64, height=48, angle=a)
            for a in (0.0, 0.45)]
    splats = [project_test_scene(jax.random.PRNGKey(7), 300, c)[1]
              for c in cams]
    m2d = jnp.concatenate([s.means2d for s in splats])
    conics = jnp.concatenate([s.conics for s in splats])
    colors = jnp.concatenate([s.colors for s in splats])
    opacs = jnp.concatenate([s.opacities for s in splats])
    radii = jnp.concatenate([s.radii for s in splats])
    depths = jnp.concatenate([s.depths for s in splats])
    tx, ty = -(-64 // TILE), -(-48 // TILE)
    numt = tx * ty
    n_cams, cap = 2, 2 * 2048
    isect = isect_tile_rows_blocked(
        m2d, radii, depths, n_cams, TILE, TILE, tx, ty, capacity=cap,
        opacities=opacs)
    # per-camera survivors: the binding constraint the budget is sized from
    kept_max = int(isect.num_kept) // n_cams
    bpc = cap // n_cams
    assert 0 < kept_max < bpc
    bbc = _align(kept_max)
    t_ids = jnp.arange(n_cams * numt, dtype=jnp.int32) % numt
    px0, py0 = (t_ids % tx) * TILE, (t_ids // tx) * TILE

    def run(ids, tlo, thi, m2d_):
        return rasterize_slots_pl(
            m2d_, conics, colors, opacs, ids, None, px0, py0,
            TILE, TILE, 256, interpret=True,
            tile_lo=tlo, tile_hi=thi, seg_blocks=n_cams)

    ids_c, tlo_c, thi_c = compact_entries_blocked(
        isect.gauss_ids, isect.tile_lo, isect.tile_hi,
        n_cams, numt, bpc, bbc)
    assert ids_c.shape[0] == n_cams * bbc
    col_f, t_f = run(isect.gauss_ids, isect.tile_lo, isect.tile_hi, m2d)
    col_c, t_c = run(ids_c, tlo_c, thi_c, m2d)
    np.testing.assert_array_equal(np.asarray(col_f), np.asarray(col_c))
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_c))

    def grads(ids, tlo, thi):
        def f(m2d_):
            col, t = run(ids, tlo, thi, m2d_)
            return jnp.sum(col * col) + jnp.sum(t)
        return jax.grad(f)(m2d)

    np.testing.assert_array_equal(
        np.asarray(grads(isect.gauss_ids, isect.tile_lo, isect.tile_hi)),
        np.asarray(grads(ids_c, tlo_c, thi_c)))


def test_trainer_step_invariant_under_blend_budget(eight_devices):
    """A full distributed train step with a compacted blend budget matches
    the uncompacted step bitwise (loss and updated parameters)."""
    from jax.sharding import Mesh
    from grendel_tpu.parallel.sharded import ParallelConfig, ShardedTrainer
    from grendel_tpu.parallel import divide_rows, pack_gt_rows
    from grendel_tpu.models import scaled_lrs
    from grendel_tpu.engine.train import XyzLrSchedule
    from grendel_tpu.cameras import batch_camera_arrays
    from tests.test_parallel import _make_params, train_state_init

    mesh = Mesh(np.array(eight_devices), ("d",))
    h, w, capacity = 64, 48, 256
    cams_host = [make_test_camera(w, h, angle=a) for a in (0.0, 0.5)]
    params, alive = _make_params(jax.random.key(11), 200, capacity,
                                 sh_degree=1)
    for c in cams_host:
        c.gt_image_u8 = np.full((3, h, w), 100, np.uint8)
    lrs, sc = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=2)
    sched = XyzLrSchedule(1.6e-3 * sc, 1.6e-5 * sc, 0.01, 1000)

    def step_with(blend):
        cfg = ParallelConfig(
            n_devices=8, bsz=2, img_h=h, img_w=w,
            isect_capacity=4096, blend_capacity=blend,
            max_per_tile=256, chunk=32,
        ).resolved(capacity // 8)
        tr = ShardedTrainer(mesh, cfg, sh_degree=1, lambda_dssim=0.2,
                            lrs=lrs, xyz_sched=sched)
        state = tr.shard_state(train_state_init(params, alive))
        pos_np = divide_rows(np.ones(cfg.total_rows), 8, cfg.n_row_slots)
        gt_rows = jnp.asarray(pack_gt_rows(
            cams_host, pos_np, 8, cfg.n_row_slots, cfg.tile_h, h, w))
        state, metrics = tr.step(
            state, batch_camera_arrays(cams_host), gt_rows,
            jnp.asarray(pos_np), jnp.zeros(3))
        return state, metrics

    s_full, m_full = step_with(0)
    kept = int(np.asarray(m_full["num_kept"]).max())
    bb = _align(max(kept, 1))
    assert bb < 4096, "need slack for the budget to actually compact"
    s_comp, m_comp = step_with(bb)
    assert float(m_full["loss"]) == float(m_comp["loss"])
    np.testing.assert_array_equal(
        np.asarray(s_full.params.means3d), np.asarray(s_comp.params.means3d))
    np.testing.assert_array_equal(
        np.asarray(s_full.params.opacities_raw),
        np.asarray(s_comp.params.opacities_raw))


def test_render_batch_blend_budget_invariant_interpret():
    """engine/render.py's blocked path with a blend budget reproduces the
    uncompacted images bitwise (interpret-mode pallas)."""
    from grendel_tpu.engine.render import RenderConfig, render_batch
    from grendel_tpu.cameras import batch_camera_arrays
    from tests.test_train_step import _make_params

    h, w = 48, 64
    params, alive = _make_params(jax.random.key(2), 150, 256, sh_degree=1)
    cams_host = [make_test_camera(w, h, angle=a) for a in (0.0, 0.3)]
    cams = batch_camera_arrays(cams_host)

    def render(blend):
        cfg = RenderConfig(img_h=h, img_w=w, isect_capacity=2048,
                           blend_capacity=blend, max_per_tile=256,
                           backend="pallas_interpret")
        imgs, _, aux = render_batch(params, alive, cams, 1, cfg)
        return imgs, aux

    imgs_full, aux = render(0)
    # per-camera survivors bound the budget; keep slack below capacity
    kept = int(np.asarray(aux.n_entries).sum(axis=1).max())
    bb = _align(max(kept, 1))
    assert bb < 2048
    imgs_comp, _ = render(bb)
    np.testing.assert_array_equal(np.asarray(imgs_full),
                                  np.asarray(imgs_comp))
