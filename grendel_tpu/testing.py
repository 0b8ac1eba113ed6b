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


# ---------------------------------------------------------------------------
# Structured synthetic protocol (round-4): a raytraced scene whose held-out
# PSNR is meaningful. The round-3 endurance protocol (12 cameras on a circle,
# random Gaussian clutter) reconstructed train views at 46 dB but held-out
# views at ~14 dB — overfitting by construction. This scene fixes both causes:
#   * content with actual structure: a textured ground disk + textured
#     spheres, lambertian-shaded by a directional light with hard shadows —
#     view-consistent OPAQUE surfaces, not a Gaussian-mixture self-render,
#     so PSNR measures reconstruction the way a real dataset does;
#   * a dense hemisphere rig: N cameras on three interleaved elevation
#     rings ordered by azimuth, with every llffhold-th held out — the
#     reference Mip360 protocol's split (ref dataset_readers.py:213-218).
# ---------------------------------------------------------------------------


def lookat_camera(pos, target, width: int, height: int, fovx: float = 1.1,
                  uid: int = 0, name: str = "") -> Camera:
    """Camera at ``pos`` looking at ``target``.

    Convention matches make_test_camera / the projection stack: w2c rows are
    the camera axes (x right, y image-down, z forward); world +y is "down"
    (scene content hangs below y=ground, cameras have y < target_y)."""
    pos = np.asarray(pos, np.float64)
    target = np.asarray(target, np.float64)
    f = target - pos
    f = f / np.linalg.norm(f)
    r = np.cross([0.0, 1.0, 0.0], f)
    nr = np.linalg.norm(r)
    assert nr > 1e-6, "degenerate look-at: forward parallel to world y"
    r = r / nr
    d = np.cross(f, r)
    R_w2c = np.stack([r, d, f])
    t_w2c = -R_w2c @ pos
    fovy = 2 * np.arctan(np.tan(fovx / 2) * height / width)
    return Camera(uid=uid, image_name=name or f"view_{uid:03d}",
                  R=R_w2c.T, T=t_w2c, fovx=float(fovx), fovy=float(fovy),
                  width=width, height=height)


# (center_xz, radius, texture kind, two palette colors, texture frequency);
# sphere centers rest on the ground plane y=_GROUND_Y (world +y is down, so
# "above the ground" means center_y = _GROUND_Y - radius)
_GROUND_Y = 0.8
_PLANE_RADIUS = 6.0
_LIGHT = np.array([0.35, -0.9, 0.2]) / np.linalg.norm([0.35, -0.9, 0.2])
_STRUCT_SPHERES = [
    ((0.00, 0.00), 0.52, "stripes", (0.85, 0.25, 0.20), (0.95, 0.85, 0.70), 9.0),
    ((1.15, 0.55), 0.38, "checker", (0.20, 0.45, 0.85), (0.90, 0.90, 0.95), 6.0),
    ((-1.05, 0.50), 0.33, "marble", (0.15, 0.60, 0.30), (0.92, 0.95, 0.88), 4.0),
    ((0.65, -0.95), 0.25, "stripes", (0.90, 0.65, 0.15), (0.25, 0.20, 0.45), 14.0),
    ((-0.70, -0.80), 0.22, "dots", (0.75, 0.20, 0.60), (0.95, 0.92, 0.80), 8.0),
    ((0.10, 1.25), 0.18, "marble", (0.30, 0.30, 0.80), (0.85, 0.90, 0.98), 6.0),
    ((-1.50, -0.35), 0.15, "checker", (0.85, 0.45, 0.20), (0.25, 0.25, 0.30), 8.0),
    ((1.60, -0.45), 0.12, "stripes", (0.20, 0.70, 0.70), (0.95, 0.95, 0.95), 16.0),
]


def _sphere_params():
    out = []
    for (cx, cz), r, kind, c1, c2, freq in _STRUCT_SPHERES:
        out.append((np.array([cx, _GROUND_Y - r, cz]), r, kind,
                    np.array(c1), np.array(c2), freq))
    return out


def _texture_plane(p):
    """Checker with a low-frequency color wash on the ground disk."""
    s = 0.55
    check = ((np.floor(p[:, 0] / s) + np.floor(p[:, 2] / s)) % 2)
    c1 = np.array([0.78, 0.74, 0.66])
    c2 = np.array([0.35, 0.38, 0.42])
    base = np.where(check[:, None] > 0.5, c1, c2)
    wash = 0.5 + 0.5 * np.sin(0.7 * p[:, 0] + 0.9 * p[:, 2])
    tint = np.stack([0.06 * wash, 0.03 * wash, -0.05 * wash], axis=-1)
    return np.clip(base + tint, 0.0, 1.0)


def _texture_sphere(p, center, radius, kind, c1, c2, freq):
    q = (p - center) / radius
    if kind == "stripes":
        t = 0.5 + 0.5 * np.sin(freq * np.arctan2(q[:, 2], q[:, 0]))
    elif kind == "checker":
        u = np.arctan2(q[:, 2], q[:, 0])
        v = np.arccos(np.clip(q[:, 1], -1, 1))
        t = ((np.floor(u * freq / np.pi) + np.floor(v * freq / np.pi)) % 2)
    elif kind == "dots":
        t = (np.sin(freq * q[:, 0]) * np.sin(freq * q[:, 1])
             * np.sin(freq * q[:, 2]) > 0.15).astype(np.float64)
    else:  # marble
        t = 0.5 + 0.5 * np.sin(freq * q[:, 0]
                               + 2.5 * np.sin(2.2 * q[:, 1])
                               + 1.5 * np.sin(3.1 * q[:, 2]))
    return c1[None] * (1 - t[:, None]) + c2[None] * t[:, None]


def _shade(points, normals, albedo, spheres, ambient=0.34, kd=0.62):
    """Lambertian + directional light with hard sphere shadows (the shadow
    factor keeps some diffuse so shadowed texture stays learnable)."""
    # _LIGHT is the unit TO-LIGHT direction (negative y: the light hangs
    # "above" the scene, where world -y is up)
    ndl = np.maximum(0.0, normals @ _LIGHT)
    occ = np.zeros(points.shape[0], bool)
    ldir = _LIGHT
    for c, r, *_ in spheres:
        oc = points + 1e-3 * ldir - c
        b = oc @ ldir
        disc = b * b - (np.sum(oc * oc, axis=-1) - r * r)
        hit = (disc > 0) & (-b + np.sqrt(np.maximum(disc, 0)) > 0) & (-b > 0)
        occ |= hit
    light = ambient + kd * ndl * np.where(occ, 0.15, 1.0)
    return np.clip(albedo * light[:, None], 0.0, 1.0)


def raytrace_image(cam: Camera, bg=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Render the structured scene for ``cam`` -> (3, H, W) float32 in [0,1].

    Rays use the projection stack's pixel convention exactly (pixel (x, y)
    center at ndc ((2x+1)/W - 1, (2y+1)/H - 1), ops/projection.py:117-124),
    so raytraced GT and rasterized renders are geometrically consistent to
    sub-pixel (pinned by tests/test_structured_scene.py)."""
    h, w = cam.height, cam.width
    spheres = _sphere_params()
    ndc_x = (2 * np.arange(w) + 1) / w - 1
    ndc_y = (2 * np.arange(h) + 1) / h - 1
    dx = (ndc_x * cam.tanfovx)[None, :].repeat(h, 0)
    dy = (ndc_y * cam.tanfovy)[:, None].repeat(w, 1)
    d_cam = np.stack([dx, dy, np.ones_like(dx)], axis=-1).reshape(-1, 3)
    R_w2c = cam.world_view[:3, :3].astype(np.float64)
    d = d_cam @ R_w2c                    # rows are camera axes: R^T @ d_cam
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = cam.camera_center.astype(np.float64)

    n_ray = d.shape[0]
    t_best = np.full(n_ray, np.inf)
    obj = np.full(n_ray, -1, np.int32)   # -1 none, 0..n-1 spheres, 99 plane
    for i, (c, r, *_ ) in enumerate(spheres):
        b = d @ (o - c)
        q = np.sum((o - c) ** 2) - r * r
        disc = b * b - q
        ok = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        ok &= (t > 1e-4) & (t < t_best)
        t_best = np.where(ok, t, t_best)
        obj = np.where(ok, i, obj)
    # ground disk
    dy_r = d[:, 1]
    tp = (_GROUND_Y - o[1]) / np.where(np.abs(dy_r) < 1e-9, 1e-9, dy_r)
    pp = o[None] + tp[:, None] * d
    in_disk = (tp > 1e-4) & (pp[:, 0] ** 2 + pp[:, 2] ** 2
                             < _PLANE_RADIUS ** 2) & (tp < t_best)
    t_best = np.where(in_disk, tp, t_best)
    obj = np.where(in_disk, 99, obj)

    img = np.tile(np.asarray(bg, np.float64)[None], (n_ray, 1))
    hit = obj >= 0
    pts = o[None] + t_best[:, None] * d
    # plane
    m = obj == 99
    if m.any():
        normals = np.tile(np.array([0.0, -1.0, 0.0])[None], (m.sum(), 1))
        img[m] = _shade(pts[m], normals, _texture_plane(pts[m]), spheres)
    for i, (c, r, kind, c1, c2, freq) in enumerate(spheres):
        m = obj == i
        if not m.any():
            continue
        normals = (pts[m] - c) / r
        albedo = _texture_sphere(pts[m], c, r, kind, c1, c2, freq)
        img[m] = _shade(pts[m], normals, albedo, spheres)
    return img.reshape(h, w, 3).transpose(2, 0, 1).astype(np.float32)


def _structured_point_cloud(n_points: int, seed: int):
    """SfM-like init: noisy surface samples with approximately-shaded colors
    (the real protocol inits from COLMAP sparse points with true colors,
    ref scene/dataset_readers.py:221-252)."""
    rng = np.random.default_rng(seed)
    spheres = _sphere_params()
    areas = np.array([4 * np.pi * r * r for _, r, *_ in spheres])
    plane_area = np.pi * 3.6 ** 2          # the camera-visible inner disk
    w_all = np.concatenate([[plane_area], areas])
    counts = (n_points * w_all / w_all.sum()).astype(int)
    pts, cols = [], []
    # plane samples (denser toward the center, like SfM coverage)
    n_p = counts[0]
    rad = 3.6 * np.sqrt(rng.random(n_p)) * (0.55 + 0.45 * rng.random(n_p))
    az = 2 * np.pi * rng.random(n_p)
    p = np.stack([rad * np.cos(az), np.full(n_p, _GROUND_Y),
                  rad * np.sin(az)], axis=-1)
    nrm = np.tile(np.array([0.0, -1.0, 0.0])[None], (n_p, 1))
    c = _shade(p, nrm, _texture_plane(p), spheres)
    pts.append(p); cols.append(c)
    for (center, r, kind, c1, c2, freq), n_s in zip(spheres, counts[1:]):
        u = rng.normal(size=(max(n_s, 8), 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        p = center[None] + r * u
        c = _shade(p, u, _texture_sphere(p, center, r, kind, c1, c2, freq),
                   spheres)
        pts.append(p); cols.append(c)
    pts = np.concatenate(pts) + rng.normal(scale=0.01,
                                           size=(sum(len(x) for x in pts), 3))
    cols = np.concatenate(cols)
    from .data.readers import PointCloud

    return PointCloud(points=pts.astype(np.float32),
                      colors=cols.astype(np.float32))


class StructuredSyntheticScene:
    """Duck-typed Scene over the raytraced structured set (round-4 quality
    protocol). ``n_cams`` cameras on three interleaved elevation rings of a
    hemisphere above the scene, ordered by azimuth; every ``llffhold``-th is
    held out (the reference Mip360 split, dataset_readers.py:213-218), so
    test views sit BETWEEN training views on every ring."""

    def __init__(self, width: int = 1280, height: int = 832,
                 n_cams: int = 72, llffhold: int = 8,
                 n_init_points: int = 100_000, seed: int = 0,
                 fovx: float = 1.1):
        target = np.array([0.0, 0.42, 0.0])
        rings = [  # (distance from target, elevation above horizon, share)
            (4.4, np.deg2rad(21.0), 0.5),
            (3.8, np.deg2rad(38.0), 0.333),
            (3.1, np.deg2rad(56.0), 0.167),
        ]
        counts = [max(3, int(round(n_cams * s))) for _, _, s in rings]
        counts[0] += n_cams - sum(counts)
        cams = []
        for k, ((dist, elev, _), cnt) in enumerate(zip(rings, counts)):
            for i in range(cnt):
                # stagger rings; keep az in [0, 2pi) so the azimuth sort
                # below interleaves by TRUE azimuth (an unwrapped stagger
                # offset scrambled the wrap seam — ADVICE r4)
                az = 2 * np.pi * ((i / cnt + k * 0.37) % 1.0)
                pos = target + np.array([
                    dist * np.cos(elev) * np.cos(az),
                    -dist * np.sin(elev),               # world -y is up
                    dist * np.cos(elev) * np.sin(az),
                ])
                cams.append((az, pos))
        cams.sort(key=lambda t: t[0])                   # azimuth order
        cameras = []
        for uid, (az, pos) in enumerate(cams):
            cam = lookat_camera(pos, target, width, height, fovx=fovx,
                                uid=uid, name=f"view_{uid:03d}")
            cam.gt_image_u8 = np.asarray(
                np.clip(raytrace_image(cam), 0, 1) * 255
            ).astype(np.uint8)
            cameras.append(cam)
        self.test_cameras = [c for i, c in enumerate(cameras)
                             if i % llffhold == 0]
        self.train_cameras = [c for i, c in enumerate(cameras)
                              if i % llffhold != 0]
        centers = np.stack([c.camera_center for c in cameras])
        dists = np.linalg.norm(centers - centers.mean(0), axis=-1)
        self.cameras_extent = float(dists.max() * 1.1)
        self.point_cloud = _structured_point_cloud(n_init_points, seed)
