"""Per-Gaussian preprocessing: project 3D Gaussians to screen space.

This is the TPU-native counterpart of the reference rasterizer's
``preprocess_gaussians`` phase (behavioral contract documented in SURVEY.md
§2.9, call sites /root/reference/gaussian_renderer/__init__.py:949-958):
frustum cull, project means through the full projection matrix, build the
2D covariance via the EWA splatting Jacobian, invert to a conic, compute a
3-sigma pixel radius, and evaluate SH -> RGB along the view direction.

Everything here is dense, branch-free jnp math over the (padded) Gaussian
axis — XLA fuses it into a handful of elementwise kernels; no Pallas
needed for this stage. Differentiable w.r.t. all Gaussian inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .sh import sh_to_rgb
from ..utils.math3d import quat_to_rotmat, quat_rotmat_entries

Array = jnp.ndarray

# Low-pass filter added to the 2D covariance diagonal (EWA antialias floor),
# same constant the 3DGS forward uses.
COV2D_DILATION = 0.3
# Minimum view-space depth for frustum inclusion.
NEAR_CULL = 0.2


class ProjectedSplats(NamedTuple):
    """Screen-space Gaussians for one camera over the local shard."""

    means2d: Array     # (N, 2) pixel coords
    conics: Array      # (N, 3) inverse 2D covariance (a, b, c): ax^2+2bxy+cy^2
    colors: Array      # (N, 3) RGB in [0, inf)
    opacities: Array   # (N,)
    depths: Array      # (N,) view-space z
    radii: Array       # (N,) int32 pixel radius (0 => culled)


def build_cov3d(scales: Array, quats: Array) -> Array:
    """(N,3) activated scales + (N,4) quats -> (N,3,3) covariance R S S^T R^T.

    Only for small batches / tests — (N,3,3) arrays pad 56.9x on TPU; the
    projection hot path uses the component form below.
    """
    R = quat_to_rotmat(quats)                      # (N,3,3)
    M = R * scales[..., None, :]                   # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def _view_cov2d_terms(scales: Array, quats: Array, viewmat: Array):
    """The six unique entries of V = W (R S S^T R^T) W^T as (N,) arrays.

    With u_j = W @ (j-th column of R): V = sum_j s_j^2 u_j u_j^T. All
    intermediates are (N,) component arrays — no (N,3,3) materialization
    (which would tile to (4,128) and blow memory 56.9x at scale).
    """
    r = quat_rotmat_entries(quats)                 # 9 x (N,)
    w_mat = viewmat[:3, :3]
    s2 = scales * scales                           # (N, 3)
    v00 = v01 = v02 = v11 = v12 = v22 = 0.0
    for j in range(3):
        rj = (r[0 + j], r[3 + j], r[6 + j])        # column j of R
        u0 = w_mat[0, 0] * rj[0] + w_mat[0, 1] * rj[1] + w_mat[0, 2] * rj[2]
        u1 = w_mat[1, 0] * rj[0] + w_mat[1, 1] * rj[1] + w_mat[1, 2] * rj[2]
        u2 = w_mat[2, 0] * rj[0] + w_mat[2, 1] * rj[1] + w_mat[2, 2] * rj[2]
        sj = s2[:, j]
        v00 = v00 + sj * u0 * u0
        v01 = v01 + sj * u0 * u1
        v02 = v02 + sj * u0 * u2
        v11 = v11 + sj * u1 * u1
        v12 = v12 + sj * u1 * u2
        v22 = v22 + sj * u2 * u2
    return v00, v01, v02, v11, v12, v22


def project_gaussians(
    means3d: Array,          # (N,3)
    scales: Array,           # (N,3) activated (exp'd)
    quats: Array,            # (N,4) unnormalized
    opacities: Array,        # (N,) activated (sigmoid'd)
    sh: Array,               # (N,K,3) full SH coeffs (dc at 0)
    alive: Array,            # (N,) bool — padded-capacity mask
    viewmat: Array,          # (4,4)
    full_proj: Array,        # (4,4)
    campos: Array,           # (3,)
    tanfov: Array,           # (2,) [tanfovx, tanfovy]
    img_h: int,
    img_w: int,
    sh_degree: int,
    scale_modifier: float = 1.0,
) -> ProjectedSplats:
    """Project one camera's view of the local Gaussian shard.

    Culled/dead Gaussians get radii=0, opacity=0 and depth=+inf so every
    downstream stage can treat radii>0 as the visibility predicate (matching
    the reference's ``radii > 0`` convention).
    """
    n = means3d.shape[0]
    f32 = jnp.float32
    means3d = means3d.astype(f32)

    # --- view transform & frustum cull ---
    p_view = means3d @ viewmat[:3, :3].T + viewmat[:3, 3]     # (N,3)
    depth = p_view[:, 2]
    in_front = depth > NEAR_CULL

    # --- screen-space mean via full projection ---
    p_hom = means3d @ full_proj[:3, :3].T + full_proj[:3, 3]  # (N,3)
    w_hom = means3d @ full_proj[3, :3].T + full_proj[3, 3]    # (N,)
    rw = 1.0 / (w_hom + 1e-7)
    ndc = p_hom[:, :2] * rw[:, None]
    mean2d = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * img_w - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * img_h - 1.0) * 0.5,
        ],
        axis=-1,
    )

    # --- 2D covariance via EWA Jacobian ---
    tanfovx, tanfovy = tanfov[0], tanfov[1]
    focal_x = img_w / (2.0 * tanfovx)
    focal_y = img_h / (2.0 * tanfovy)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    safe_z = jnp.where(in_front, depth, 1.0)
    txz = p_view[:, 0] / safe_z
    tyz = p_view[:, 1] / safe_z
    tx = jnp.clip(txz, -limx, limx) * safe_z
    ty = jnp.clip(tyz, -limy, limy) * safe_z

    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z
    # J rows (only the 2x3 part matters)
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    v00, v01, v02, v11, v12, v22 = _view_cov2d_terms(
        scales * scale_modifier, quats, viewmat)

    # T = J V J^T restricted to 2x2; expand with the sparse J structure.
    c00 = j00 * (j00 * v00 + j02 * v02) + j02 * (j00 * v02 + j02 * v22)
    c01 = j00 * (j11 * v01 + j12 * v02) + j02 * (j11 * v12 + j12 * v22)
    c11 = j11 * (j11 * v11 + j12 * v12) + j12 * (j11 * v12 + j12 * v22)
    c00 = c00 + COV2D_DILATION
    c11 = c11 + COV2D_DILATION

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    # 3-sigma radius from the max eigenvalue of the 2x2 covariance.
    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - safe_det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # On-screen test: does the 3-sigma box overlap the image at all?
    on_screen = (
        (mean2d[:, 0] + radius_f > 0)
        & (mean2d[:, 0] - radius_f < img_w)
        & (mean2d[:, 1] + radius_f > 0)
        & (mean2d[:, 1] - radius_f < img_h)
    )

    visible = in_front & det_ok & on_screen & alive
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # --- SH -> RGB along view dir ---
    dirs = means3d - campos
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    colors = sh_to_rgb(sh_degree, sh, dirs)

    return ProjectedSplats(
        means2d=mean2d,
        conics=conic,
        colors=colors,
        opacities=jnp.where(visible, opacities, 0.0),
        depths=jnp.where(visible, depth, jnp.inf),
        radii=radii,
    )


def project_gaussians_batched(
    means3d, scales, quats, opacities, sh, alive,
    cams, img_h: int, img_w: int, sh_degree: int,
) -> ProjectedSplats:
    """vmap over a batch of cameras (CameraArrays with leading B axis).

    Returns ProjectedSplats with (B, N, ...) leaves — the TPU analogue of
    gsplat's ``fully_fused_projection`` batched path the reference uses
    (/root/reference/gaussian_renderer/__init__.py:1115-1127).
    """
    fn = lambda vm, fp, cp, tf: project_gaussians(
        means3d, scales, quats, opacities, sh, alive,
        vm, fp, cp, tf, img_h, img_w, sh_degree,
    )
    return jax.vmap(fn)(cams.viewmat, cams.full_proj, cams.campos, cams.tanfov)
