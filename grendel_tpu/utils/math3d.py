"""Camera and rigid-body math for 3D Gaussian Splatting.

Implements the standard 3DGS camera model (world-to-view + OpenGL-style
perspective projection, EWA splatting conventions) used by the reference
framework (see /root/reference/utils/graphics_utils.py:56-84 and
/root/reference/utils/general_utils.py:416-451 for the behaviors this
reproduces). All functions are pure JAX and differentiable.

Conventions:
  * Matrices act on column vectors: ``p_view = view @ [p; 1]``.
  * ``R`` passed to :func:`world_to_view` is the camera-to-world rotation
    (COLMAP ``qvec2rotmat(qvec).T``), ``t`` is the world-to-camera
    translation — matching the reference's dataset readers.
  * NDC-to-pixel uses the 3DGS convention ``((ndc + 1) * size - 1) / 2``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def quat_to_rotmat(q: Array) -> Array:
    """Unit-norm quaternion(s) (..., 4) [w, x, y, z] -> rotation matrix (..., 3, 3).

    Normalizes the input (the model stores unconstrained 4-vectors).
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quat_rotmat_entries(q: Array):
    """Rotation-matrix entries of quaternion(s) (..., 4) as nine (...,) arrays.

    Component form of :func:`quat_to_rotmat` — use this on large batches:
    an (N, 3, 3) array tiles to (4, 128) on TPU, a 56.9x memory padding
    blow-up that OOMs multi-million-Gaussian models.
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera matrix from COLMAP-style (R=c2w rotation, t=w2c translation).

    ``translate``/``scale`` recentre the camera positions (used for scene
    normalization, mirroring the reference's getWorld2View2 behavior).
    Host-side (numpy): cameras are static per scene.
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    cam_center = c2w[:3, 3]
    cam_center = (cam_center + translate) * scale
    c2w[:3, 3] = cam_center
    return np.linalg.inv(c2w).astype(np.float32)


def perspective_projection(znear: float, zfar: float,
                           fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style asymmetric-frustum projection matrix used by 3DGS.

    Maps view-space z in [znear, zfar] to [0, 1] after perspective divide
    (z_sign = +1 convention of the 3DGS renderer).
    """
    tan_half_fovy = math_tan(fovy / 2)
    tan_half_fovx = math_tan(fovx / 2)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def math_tan(x: float) -> float:
    return float(np.tan(x))


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * float(np.arctan(pixels / (2.0 * focal)))


def ndc_to_pixel(v: Array, size: int) -> Array:
    """3DGS NDC [-1,1] -> pixel-center coordinate."""
    return ((v + 1.0) * size - 1.0) * 0.5


def inverse_sigmoid(x: Array) -> Array:
    return jnp.log(x / (1.0 - x))
