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
