"""Spherical-harmonics color evaluation (degrees 0-3).

Same math the reference evaluates in its SH utility / CUDA preprocess
(behavioral parity with /root/reference/utils/sh_utils.py:57-128 —
standard real SH basis constants, public domain math). Vectorized over
Gaussians; degree is a static argument (the training loop ramps it every
1000 iterations, giving at most 4 recompiles).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(degree: int, sh: Array, dirs: Array) -> Array:
    """Evaluate SH colors.

    Args:
      degree: static active degree in [0, 3].
      sh: (..., K, 3) coefficients with K >= (degree+1)**2; index 0 is DC.
      dirs: (..., 3) unit view directions (camera -> point).

    Returns:
      (..., 3) linear RGB before the +0.5 shift.
    """
    result = C0 * sh[..., 0, :]
    if degree >= 1:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result
            - C1 * y * sh[..., 1, :]
            + C1 * z * sh[..., 2, :]
            - C1 * x * sh[..., 3, :]
        )
        if degree >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if degree >= 3:
                result = (
                    result
                    + C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_rgb(degree: int, sh: Array, dirs: Array) -> Array:
    """SH -> clamped RGB as the rasterizer preprocess does (+0.5 shift, >= 0)."""
    return jnp.maximum(eval_sh(degree, sh, dirs) + 0.5, 0.0)


def rgb_to_sh(rgb: Array) -> Array:
    """Inverse of the DC band mapping (used for point-cloud color init)."""
    return (rgb - 0.5) / C0


def sh_to_rgb_dc(sh_dc: Array) -> Array:
    return sh_dc * C0 + 0.5
