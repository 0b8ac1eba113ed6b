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
