"""Shared fixtures for tests and benchmarks: synthetic scenes and cameras."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .cameras import Camera, camera_arrays
from .ops.projection import project_gaussians
from .ops import sh as sh_ops


def make_test_camera(width: int = 64, height: int = 48, dist: float = 4.0,
                     fovx: float = 1.0, angle: float = 0.0) -> Camera:
    """Camera on a circle of radius ``dist`` in the xz-plane looking at origin."""
    # w2c: rotate by -angle about y, then translate back by dist along z.
    ca, sa = np.cos(angle), np.sin(angle)
    R_w2c = np.array([[ca, 0, -sa], [0, 1, 0], [sa, 0, ca]], dtype=np.float64)
    t_w2c = np.array([0.0, 0.0, dist])
    fovy = 2 * np.arctan(np.tan(fovx / 2) * height / width)
    return Camera(
        uid=0, image_name=f"test_{angle:.2f}",
        R=R_w2c.T, T=t_w2c, fovx=fovx, fovy=float(fovy),
        width=width, height=height,
    )


def random_gaussians(key, n: int, extent: float = 1.5, sh_degree: int = 3,
                     scale_range=(-4.5, -2.5), opacity_range=(0.3, 0.95)):
    """Random raw Gaussian attributes centered at the origin (activated form)."""
    ks = jax.random.split(key, 6)
    k_sh = (sh_degree + 1) ** 2
    means = jax.random.uniform(ks[0], (n, 3), minval=-extent, maxval=extent)
    scales = jnp.exp(jax.random.uniform(ks[1], (n, 3), minval=scale_range[0],
                                        maxval=scale_range[1]))
    quats = jax.random.normal(ks[2], (n, 4))
    opac = jax.random.uniform(ks[3], (n,), minval=opacity_range[0],
                              maxval=opacity_range[1])
    sh = jnp.zeros((n, k_sh, 3))
    rgb = jax.random.uniform(ks[4], (n, 3), minval=0.1, maxval=0.9)
    sh = sh.at[:, 0, :].set(sh_ops.rgb_to_sh(rgb))
    sh = sh.at[:, 1:, :].set(0.05 * jax.random.normal(ks[5], (n, k_sh - 1, 3)))
    return means, scales, quats, opac, sh


def project_test_scene(key, n: int, cam: Camera, sh_degree: int = 3, **kw):
    means, scales, quats, opac, sh = random_gaussians(key, n, sh_degree=sh_degree, **kw)
    ca = camera_arrays(cam)
    splats = project_gaussians(
        means, scales, quats, opac, sh, jnp.ones(n, dtype=bool),
        ca.viewmat, ca.full_proj, ca.campos, ca.tanfov,
        cam.height, cam.width, sh_degree,
    )
    return (means, scales, quats, opac, sh), splats


class SyntheticScene:
    """Duck-typed stand-in for data.Scene: a random Gaussian scene rendered
    to GT images. Used by --synthetic smoke training and benchmarks."""

    def __init__(self, n_cams: int = 12, n_test: int = 2, width: int = 160,
                 height: int = 120, n_gaussians: int = 400,
                 n_init_points: int = 300, sh_degree: int = 1, seed: int = 0):
        from .engine.render import RenderConfig, render_image
        from .models.gaussian_model import GaussianParams, round_capacity
        from .utils.math3d import inverse_sigmoid
        from .data.readers import PointCloud

        key = jax.random.PRNGKey(seed)
        means, scales, quats, opac, sh = random_gaussians(
            key, n_gaussians, sh_degree=sh_degree)
        cap = round_capacity(n_gaussians, 256)
        pad = cap - n_gaussians

        def padn(x, fill=0.0):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                           constant_values=fill)

        params = GaussianParams(
            means3d=padn(means),
            sh_dc=padn(sh[:, :1, :]),
            sh_rest=padn(sh[:, 1:, :]),
            scales_raw=padn(jnp.log(scales), fill=-10.0),
            quats=padn(quats).at[n_gaussians:, 0].set(1.0),
            opacities_raw=padn(
                inverse_sigmoid(jnp.clip(opac, 1e-4, 1 - 1e-4)), fill=-10.0),
        )
        alive = jnp.arange(cap) < n_gaussians

        cfg = RenderConfig(img_h=height, img_w=width,
                           isect_capacity=1 << 15, max_per_tile=512, chunk=64)
        from .cameras import CameraArrays

        render = jax.jit(lambda vm, fp, cp, tf: render_image(
            params, alive,
            CameraArrays(viewmat=vm, full_proj=fp, campos=cp, tanfov=tf),
            sh_degree, cfg, bg=jnp.zeros(3))[0])
        cams = []
        total = n_cams + n_test
        for i in range(total):
            cam = make_test_camera(width, height,
                                   angle=2 * np.pi * i / total)
            cam.uid = i
            ca = camera_arrays(cam)
            img = render(ca.viewmat, ca.full_proj, ca.campos, ca.tanfov)
            cam.gt_image_u8 = np.asarray(
                (jnp.clip(img, 0, 1) * 255).astype(jnp.uint8))
            cams.append(cam)
        self.train_cameras = cams[:n_cams]
        self.test_cameras = cams[n_cams:]
        self.cameras_extent = 4.0 * 1.1

        # init point cloud: noisy samples of the true means
        rng = np.random.default_rng(seed)
        pts = np.asarray(means)[
            rng.integers(0, n_gaussians, n_init_points)]
        pts = pts + rng.normal(scale=0.05, size=pts.shape)
        cols = rng.uniform(0.2, 0.8, (n_init_points, 3))
        self.point_cloud = PointCloud(
            points=pts.astype(np.float32), colors=cols.astype(np.float32))
