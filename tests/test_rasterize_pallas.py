"""Pallas rasterizer vs the JAX reference implementation (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grendel_tpu.ops.isect import isect_tiles
from grendel_tpu.ops.rasterize_jax import rasterize_slots
from grendel_tpu.ops.rasterize_pallas import rasterize_slots_pl
from grendel_tpu.testing import make_test_camera, project_test_scene


TILE = 16


def _scene(n=300, w=64, h=48, seed=0):
    cam = make_test_camera(width=w, height=h)
    _, splats = project_test_scene(jax.random.PRNGKey(seed), n, cam)
    tx, ty = -(-w // TILE), -(-h // TILE)
    isect = isect_tiles(splats.means2d, splats.radii, splats.depths,
                        TILE, TILE, tx, ty, capacity=4096)
    t_ids = jnp.arange(tx * ty, dtype=jnp.int32)
    px0 = (t_ids % tx) * TILE
    py0 = (t_ids // tx) * TILE
    return splats, isect, px0, py0


def _run_jax(splats, isect, px0, py0, max_per_tile=256):
    return rasterize_slots(
        splats.means2d, splats.conics, splats.colors, splats.opacities,
        isect.gauss_ids, isect.tile_offsets, px0, py0,
        TILE, TILE, max_per_tile, 64)


def _run_pl(splats, isect, px0, py0, max_per_tile=256):
    return rasterize_slots_pl(
        splats.means2d, splats.conics, splats.colors, splats.opacities,
        isect.gauss_ids, isect.tile_offsets, px0, py0,
        TILE, TILE, max_per_tile, interpret=True)


def test_pallas_forward_matches_jax():
    splats, isect, px0, py0 = _scene()
    col_j, t_j = _run_jax(splats, isect, px0, py0)
    col_p, t_p = _run_pl(splats, isect, px0, py0)
    np.testing.assert_allclose(np.asarray(col_p), np.asarray(col_j),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_j),
                               atol=1e-5, rtol=1e-5)


def test_pallas_forward_respects_max_per_tile():
    splats, isect, px0, py0 = _scene(n=500)
    col_j, t_j = _run_jax(splats, isect, px0, py0, max_per_tile=64)
    col_p, t_p = _run_pl(splats, isect, px0, py0, max_per_tile=64)
    np.testing.assert_allclose(np.asarray(col_p), np.asarray(col_j),
                               atol=1e-5, rtol=1e-5)


def test_pallas_backward_matches_jax():
    splats, isect, px0, py0 = _scene(n=250)

    def loss_jax(m2d, con, col, op):
        c, t = rasterize_slots(m2d, con, col, op, isect.gauss_ids,
                               isect.tile_offsets, px0, py0,
                               TILE, TILE, 256, 64)
        # include a T-dependent term so d t_final is exercised (bg compositing)
        return jnp.sum(c * c) + 0.7 * jnp.sum(t * t)

    def loss_pl(m2d, con, col, op):
        c, t = rasterize_slots_pl(m2d, con, col, op, isect.gauss_ids,
                                  isect.tile_offsets, px0, py0,
                                  TILE, TILE, 256, interpret=True)
        return jnp.sum(c * c) + 0.7 * jnp.sum(t * t)

    args = (splats.means2d, splats.conics, splats.colors, splats.opacities)
    v_j, g_j = jax.value_and_grad(loss_jax, argnums=(0, 1, 2, 3))(*args)
    v_p, g_p = jax.value_and_grad(loss_pl, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v_p), float(v_j), rtol=1e-5)
    names = ("means2d", "conics", "colors", "opacities")
    for name, gj, gp in zip(names, g_j, g_p):
        gj, gp = np.asarray(gj), np.asarray(gp)
        scale = np.abs(gj).max() + 1e-8
        np.testing.assert_allclose(
            gp / scale, gj / scale, atol=2e-5,
            err_msg=f"grad mismatch: {name}",
        )


def test_pallas_empty_tiles():
    """Tiles with zero entries must render as background (T=1, color=0)."""
    splats, isect, px0, py0 = _scene(n=5)
    col_p, t_p = _run_pl(splats, isect, px0, py0)
    n_per_tile = np.asarray(isect.tile_offsets[1:] - isect.tile_offsets[:-1])
    empty = n_per_tile == 0
    assert empty.any()
    np.testing.assert_array_equal(np.asarray(col_p)[empty], 0.0)
    np.testing.assert_array_equal(np.asarray(t_p)[empty], 1.0)


def test_render_batch_rowslots_matches_vmapped_jax():
    """The single-chip bsz>1 row-slot path (one isect + one kernel for the
    whole batch) must match the per-camera vmapped jax backend: images,
    param grads, and the means2d tap grads used for densify stats."""
    from grendel_tpu.cameras import batch_camera_arrays
    from grendel_tpu.engine.render import RenderConfig, render_batch
    from grendel_tpu.models.gaussian_model import GaussianParams
    from grendel_tpu.testing import make_test_camera, random_gaussians
    from grendel_tpu.utils.math3d import inverse_sigmoid

    b, n, w, h = 3, 400, 96, 80
    means, scales, quats, opac, sh = random_gaussians(
        jax.random.PRNGKey(3), n, sh_degree=1)
    params = GaussianParams(
        means3d=means, sh_dc=sh[:, :1, :], sh_rest=sh[:, 1:, :],
        scales_raw=jnp.log(scales), quats=quats,
        opacities_raw=inverse_sigmoid(jnp.clip(opac, 1e-4, 1 - 1e-4)))
    alive = jnp.ones(n, bool)
    cams = batch_camera_arrays(
        [make_test_camera(w, h, angle=0.3 * i) for i in range(b)])
    bg = jnp.array([0.2, 0.1, 0.3])

    def run(backend):
        cfg = RenderConfig(img_h=h, img_w=w, isect_capacity=8192,
                           max_per_tile=512, backend=backend)

        def loss_fn(p, tap):
            imgs, splats, aux = render_batch(
                p, alive, cams, 1, cfg, bg=bg, means2d_tap=tap)
            return jnp.sum(imgs ** 2), imgs

        tap = jnp.zeros((b, n, 2), jnp.float32)
        (val, imgs), (g_p, g_tap) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, tap)
        return imgs, g_p, g_tap

    imgs_j, gp_j, gt_j = run("jax")
    imgs_p, gp_p, gt_p = run("pallas_interpret")
    np.testing.assert_allclose(np.asarray(imgs_p), np.asarray(imgs_j),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_j),
                               atol=1e-4, rtol=1e-3)
    for name in gp_j._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(gp_p, name)), np.asarray(getattr(gp_j, name)),
            atol=1e-4, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("tile_w,tile_h", [(32, 16), (16, 32), (32, 32)])
def test_tile_geometry_parity(tile_w, tile_h):
    """Non-16x16 tile geometries (a TPU tunable the reference hardwires,
    arguments/__init__.py:253-262) produce the same images and grads as
    16x16 through both backends — measured round 4 at +11% step throughput
    for 512-px tiles at garden scale (fewer duplicated isect entries)."""
    from grendel_tpu.cameras import batch_camera_arrays
    from grendel_tpu.engine.render import RenderConfig, render_batch
    from grendel_tpu.models.gaussian_model import GaussianParams
    from grendel_tpu.testing import make_test_camera, random_gaussians
    from grendel_tpu.utils.math3d import inverse_sigmoid

    b, n, w, h = 2, 300, 96, 80
    means, scales, quats, opac, sh = random_gaussians(
        jax.random.PRNGKey(5), n, sh_degree=1)
    params = GaussianParams(
        means3d=means, sh_dc=sh[:, :1, :], sh_rest=sh[:, 1:, :],
        scales_raw=jnp.log(scales), quats=quats,
        opacities_raw=inverse_sigmoid(jnp.clip(opac, 1e-4, 1 - 1e-4)))
    alive = jnp.ones(n, bool)
    cams = batch_camera_arrays(
        [make_test_camera(w, h, angle=0.4 * i) for i in range(b)])
    bg = jnp.array([0.15, 0.25, 0.1])

    def run(backend, tw, th):
        cfg = RenderConfig(img_h=h, img_w=w, tile_w=tw, tile_h=th,
                           isect_capacity=8192, max_per_tile=512,
                           backend=backend)

        def loss_fn(p, tap):
            imgs, splats, aux = render_batch(
                p, alive, cams, 1, cfg, bg=bg, means2d_tap=tap)
            return jnp.sum(imgs ** 2), imgs

        tap = jnp.zeros((b, n, 2), jnp.float32)
        (val, imgs), (g_p, g_tap) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, tap)
        return imgs, g_p, g_tap

    def close_except_flips(a, b, atol, flip_frac, flip_bound, msg):
        """Blend-order include-flips at alpha/radius thresholds move a
        handful of values when the tile enumeration changes; everything
        else must match tightly."""
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b)
        frac = float((diff > atol).mean())
        assert frac <= flip_frac, (msg, frac, diff.max())
        assert diff.max() <= flip_bound, (msg, diff.max())

    # ground truth: the jax backend at the reference's 16x16
    imgs_16, gp_16, gt_16 = run("jax", 16, 16)
    for backend in ("jax", "pallas_interpret"):
        imgs, gp, gt = run(backend, tile_w, tile_h)
        close_except_flips(imgs, imgs_16, 2e-5, 2e-3, 0.02,
                           f"{backend} {tile_w}x{tile_h} image")
        # the tap grad is per-(camera, gaussian): each flipped pixel moves
        # exactly one gaussian's entry, so the flip fraction scales with
        # 1/N (N=300 here), not 1/pixels
        t_scale = np.abs(np.asarray(gt_16)).max() + 1e-8
        close_except_flips(np.asarray(gt) / t_scale,
                           np.asarray(gt_16) / t_scale, 1e-3, 0.03, 0.05,
                           f"{backend} {tile_w}x{tile_h} tap grad")
        for name in gp_16._fields:
            # param grads share the tap grad's per-gaussian flip statistics
            g16 = np.asarray(getattr(gp_16, name))
            scale = np.abs(g16).max() + 1e-8
            close_except_flips(
                np.asarray(getattr(gp, name)) / scale, g16 / scale,
                1e-3, 0.03, 0.05,
                f"{backend} {tile_w}x{tile_h} {name}")


@pytest.mark.parametrize("tile_w,tile_h", [(16, 16), (32, 16), (32, 32)])
def test_tile_geometry_backend_parity_with_binding_cutoff(tile_w, tile_h):
    """With enough overlapping Gaussians that the per-tile depth cutoff
    BINDS, both backends must truncate identically at every geometry when
    max_per_tile scales with tile area (the production rule that keeps the
    per-pixel blend budget constant). The non-truncating regime is pinned
    by test_tile_geometry_parity; this pins the budget-dependent regime."""
    from grendel_tpu.cameras import batch_camera_arrays
    from grendel_tpu.engine.render import RenderConfig, render_batch
    from grendel_tpu.models.gaussian_model import GaussianParams
    from grendel_tpu.testing import make_test_camera, random_gaussians
    from grendel_tpu.utils.math3d import inverse_sigmoid

    b, n, w, h = 2, 600, 96, 80
    # clustered, translucent, overlapping: deep per-tile lists
    means, scales, quats, opac, sh = random_gaussians(
        jax.random.PRNGKey(9), n, extent=0.5, sh_degree=1)
    params = GaussianParams(
        means3d=means, sh_dc=sh[:, :1, :], sh_rest=sh[:, 1:, :],
        scales_raw=jnp.log(scales * 2.0), quats=quats,
        opacities_raw=inverse_sigmoid(
            jnp.clip(opac * 0.3 + 0.02, 1e-4, 1 - 1e-4)))
    alive = jnp.ones(n, bool)
    cams = batch_camera_arrays(
        [make_test_camera(w, h, angle=0.4 * i) for i in range(b)])
    bg = jnp.array([0.15, 0.25, 0.1])
    mpt = 64 * (tile_w * tile_h) // 256      # constant 1/4-entry-per-pixel

    def run(backend):
        cfg = RenderConfig(img_h=h, img_w=w, tile_w=tile_w, tile_h=tile_h,
                           isect_capacity=1 << 15, max_per_tile=mpt,
                           backend=backend)

        def loss_fn(p, tap):
            imgs, splats, aux = render_batch(
                p, alive, cams, 1, cfg, bg=bg, means2d_tap=tap)
            return jnp.sum(imgs ** 2), (imgs, aux)

        tap = jnp.zeros((b, n, 2), jnp.float32)
        (val, (imgs, aux)), (g_p, g_tap) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, tap)
        return imgs, aux, g_p, g_tap

    imgs_j, aux_j, gp_j, gt_j = run("jax")
    # the cutoff must actually bind somewhere
    assert int(np.asarray(aux_j.n_entries).max()) > mpt, \
        "scene does not exercise the depth cutoff"
    imgs_p, aux_p, gp_p, gt_p = run("pallas_interpret")
    np.testing.assert_allclose(np.asarray(imgs_p), np.asarray(imgs_j),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_j),
                               atol=1e-4, rtol=1e-3)
    for name in gp_j._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(gp_p, name)), np.asarray(getattr(gp_j, name)),
            atol=1e-4, rtol=1e-3, err_msg=name)


def test_saturation_early_exit_parity():
    """A deep stack of near-opaque Gaussians saturates tiles after a few
    entries: the Pallas walk's early exit (plus its in-flight-DMA drain
    and the deferred color accumulator) must reproduce the JAX backend's
    forward and gradients exactly in interpret mode."""
    import jax.numpy as jnp
    from grendel_tpu.testing import make_test_camera, project_test_scene

    cam = make_test_camera(width=64, height=48)
    # many clustered, large, near-opaque splats -> deep saturating lists
    _, s = project_test_scene(jax.random.PRNGKey(11), 1200, cam)
    s = s._replace(opacities=jnp.full_like(s.opacities, 0.999))
    tx, ty = -(-64 // TILE), -(-48 // TILE)
    isect = isect_tiles(s.means2d, s.radii, s.depths, TILE, TILE, tx, ty,
                        capacity=1 << 14)
    t_ids = jnp.arange(tx * ty, dtype=jnp.int32)
    px0, py0 = (t_ids % tx) * TILE, (t_ids // tx) * TILE

    def run(rs_fn, m2d, **kw):
        return rs_fn(m2d, s.conics, s.colors, s.opacities,
                     isect.gauss_ids, isect.tile_offsets, px0, py0,
                     TILE, TILE, 1024, **kw)

    col_j, t_j = run(lambda *a, **k: rasterize_slots(*a, 64), s.means2d)
    col_p, t_p = run(rasterize_slots_pl, s.means2d, interpret=True)
    # saturation actually happened somewhere: the stop rule freezes T at
    # ~T_EPS (inclusion stops once t_after < 1e-4, so T lands just above)
    assert float(jnp.min(t_j)) < 2e-4

    def close_except_flips(a, b, atol, flip_frac, flip_bound, msg):
        # at saturation, t_after sits ON the T_EPS threshold, so the two
        # backends' differently-associated f32 cumprods flip a handful of
        # include decisions — bounded count, bounded size, like the
        # hardware band in test_tpu_hw.py
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b)
        frac = float((diff > atol).mean())
        assert frac <= flip_frac, (msg, frac, diff.max())
        assert diff.max() <= flip_bound, (msg, diff.max())

    close_except_flips(col_p, col_j, 1e-5, 5e-3, 0.05, "color")
    # one flipped inclusion can move final T by ~T_EPS/(1-ALPHA_CLAMP)=1e-2
    close_except_flips(t_p, t_j, 1e-6, 5e-3, 2e-2, "transmittance")

    def grads(rs_fn, **kw):
        def f(m2d):
            col, t = run(rs_fn, m2d, **kw)
            return jnp.sum(col * col) + jnp.sum(t)
        return jax.grad(f)(s.means2d)

    g_j = np.asarray(grads(lambda *a, **k: rasterize_slots(*a, 64)))
    g_p = np.asarray(grads(rasterize_slots_pl, interpret=True))
    scale = np.abs(g_j).max() + 1e-8
    close_except_flips(g_p / scale, g_j / scale, 1e-3, 0.02, 0.2, "grad")
