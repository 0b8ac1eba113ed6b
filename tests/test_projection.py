"""Projection (preprocess) golden tests: EWA splatting semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from grendel_tpu.cameras import camera_arrays
from grendel_tpu.ops.projection import project_gaussians, build_cov3d, COV2D_DILATION
from grendel_tpu.testing import make_test_camera


def _project(means, scales=None, quats=None, opac=None, cam=None, sh_degree=0,
             alive=None):
    n = means.shape[0]
    if scales is None:
        scales = jnp.full((n, 3), 0.05)
    if quats is None:
        quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    if opac is None:
        opac = jnp.full((n,), 0.8)
    if cam is None:
        cam = make_test_camera()
    if alive is None:
        alive = jnp.ones(n, dtype=bool)
    sh = jnp.zeros((n, 16, 3)).at[:, 0, :].set(1.0)
    ca = camera_arrays(cam)
    return project_gaussians(
        means, scales, quats, opac, sh, alive,
        ca.viewmat, ca.full_proj, ca.campos, ca.tanfov,
        cam.height, cam.width, sh_degree,
    ), cam


def test_center_gaussian_projects_to_image_center():
    splats, cam = _project(jnp.zeros((1, 3)))
    # NDC 0 -> pixel (W-1)/2
    np.testing.assert_allclose(
        splats.means2d[0], [(cam.width - 1) / 2, (cam.height - 1) / 2], atol=1e-3
    )
    np.testing.assert_allclose(splats.depths[0], 4.0, atol=1e-5)
    assert int(splats.radii[0]) > 0


def test_behind_camera_culled():
    # camera sits at world z=-4 looking along +z; z=-10 is behind it
    splats, _ = _project(jnp.array([[0.0, 0.0, -10.0]]))
    assert int(splats.radii[0]) == 0
    assert float(splats.opacities[0]) == 0.0
    assert np.isinf(float(splats.depths[0]))


def test_dead_mask_culls():
    splats, _ = _project(jnp.zeros((1, 3)), alive=jnp.zeros(1, dtype=bool))
    assert int(splats.radii[0]) == 0


def test_isotropic_conic_matches_analytic():
    # isotropic world sigma s at depth d on axis: pixel sigma = focal*s/d,
    # cov2d = (focal*s/d)^2 I + 0.3 I, conic = 1/that.
    s = 0.05
    cam = make_test_camera(width=64, height=64, dist=4.0, fovx=1.0)
    splats, _ = _project(jnp.zeros((1, 3)), scales=jnp.full((1, 3), s), cam=cam)
    focal = cam.width / (2 * np.tan(cam.fovx / 2))
    var_px = (focal * s / 4.0) ** 2 + COV2D_DILATION
    np.testing.assert_allclose(splats.conics[0, 0], 1 / var_px, rtol=1e-4)
    np.testing.assert_allclose(splats.conics[0, 2], 1 / var_px, rtol=1e-4)
    np.testing.assert_allclose(splats.conics[0, 1], 0.0, atol=1e-6)
    # radius uses lam1 = mid + sqrt(max(0.1, mid^2 - det)) — isotropic hits the floor
    lam1 = var_px + np.sqrt(0.1)
    expect_radius = np.ceil(3 * np.sqrt(lam1))
    assert int(splats.radii[0]) == int(expect_radius)


def test_cov3d_from_scale_rot():
    scales = jnp.array([[0.1, 0.2, 0.3]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    cov = build_cov3d(scales, quats)[0]
    np.testing.assert_allclose(np.diag(cov), np.array([0.01, 0.04, 0.09]), rtol=1e-5)


def test_offaxis_rotated_camera_consistency():
    # same world point seen from rotated camera should land at image center too
    cam = make_test_camera(angle=0.7)
    splats, _ = _project(jnp.zeros((1, 3)), cam=cam)
    np.testing.assert_allclose(
        splats.means2d[0], [(cam.width - 1) / 2, (cam.height - 1) / 2], atol=1e-2
    )
    np.testing.assert_allclose(splats.depths[0], 4.0, atol=1e-4)


def test_gradients_flow():
    cam = make_test_camera()
    ca = camera_arrays(cam)
    n = 4
    sh = jnp.zeros((n, 16, 3)).at[:, 0, :].set(0.5)

    def f(means):
        s = project_gaussians(
            means, jnp.full((n, 3), 0.05), jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
            jnp.full((n,), 0.8), sh, jnp.ones(n, dtype=bool),
            ca.viewmat, ca.full_proj, ca.campos, ca.tanfov,
            cam.height, cam.width, 0,
        )
        return jnp.sum(s.means2d) + jnp.sum(s.conics) + jnp.sum(s.colors)

    g = jax.grad(f)(jnp.zeros((n, 3)) + jnp.array([0.1, 0.05, -0.1]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
