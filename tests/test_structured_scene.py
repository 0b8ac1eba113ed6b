"""Structured raytraced protocol (round-4 quality evidence).

The protocol exists because the old 12-camera random-clutter endurance run
could not generalize (train 46 dB / held-out ~14 dB — overfit by
construction). These tests pin the properties that make its held-out PSNR
meaningful: GT geometry consistent with the splat projection stack to
sub-pixel, a hemisphere rig with held-out views interleaved between
training views, and a short training run where HELD-OUT PSNR improves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grendel_tpu.testing import (
    StructuredSyntheticScene,
    lookat_camera,
    raytrace_image,
    _sphere_params,
)
from grendel_tpu.cameras import camera_arrays


def test_raytracer_projection_consistency():
    """The raytraced silhouette of a sphere lands where the projection
    stack puts its center: GT and rasterized renders share the pixel
    convention (ops/projection.py:117-124) to sub-pixel accuracy —
    a constant half-pixel mismatch would cap PSNR no matter how well
    the trainer fits."""
    center, radius, *_ = _sphere_params()[3]     # a small off-axis sphere
    for az, elev in ((0.3, 0.5), (2.1, 0.9), (4.4, 0.35)):
        pos = np.array([
            4.0 * np.cos(elev) * np.cos(az),
            0.42 - 4.0 * np.sin(elev),
            4.0 * np.cos(elev) * np.sin(az),
        ])
        cam = lookat_camera(pos, (0.0, 0.42, 0.0), 320, 208, fovx=1.1)
        img = raytrace_image(cam)                # (3, H, W)

        # expected pixel center via the projection stack's formula
        p_hom = np.append(center, 1.0) @ cam.full_proj.T
        ndc = p_hom[:2] / p_hom[3]
        px = ((ndc[0] + 1) * cam.width - 1) * 0.5
        py = ((ndc[1] + 1) * cam.height - 1) * 0.5

        # silhouette centroid of that sphere: isolate via a repeat trace
        # where only this sphere's albedo is nonzero is overkill — the
        # sphere is small and isolated, so take the brightness-weighted
        # centroid of a window around the expected position and check the
        # window even contains the object (not background)
        yy, xx = np.mgrid[0:cam.height, 0:cam.width]
        lum = img.mean(0)
        r_px = 26
        win = ((xx - px) ** 2 + (yy - py) ** 2) < r_px ** 2
        assert lum[win].max() > 0.05, "sphere not rendered near projection"
        w_l = np.where(win, lum, 0.0)
        cx = (w_l * xx).sum() / w_l.sum()
        cy = (w_l * yy).sum() / w_l.sum()
        # shading skews the centroid off-center; a half-pixel convention
        # bug would shift it by ~r/2 instead
        assert abs(cx - px) < 6 and abs(cy - py) < 6, (
            (cx, cy), (px, py))


def test_structured_scene_protocol_shape():
    scene = StructuredSyntheticScene(width=160, height=112, n_cams=24,
                                     llffhold=8, n_init_points=3000, seed=1)
    assert len(scene.test_cameras) == 3
    assert len(scene.train_cameras) == 21
    # held-out views are interleaved (azimuth-ordered uids, every 8th)
    test_uids = [c.uid for c in scene.test_cameras]
    assert test_uids == [0, 8, 16]
    # GT images have structure (not uniform): textured content + shadows
    g = scene.train_cameras[0].gt_image_u8.astype(np.float32) / 255.0
    assert 0.05 < g.mean() < 0.8
    assert g.std() > 0.1
    # point cloud sits on scene surfaces (inside the ground disk, above it)
    pts = scene.point_cloud.points
    assert np.all(np.abs(pts[:, [0, 2]]) < 6.5)
    assert pts[:, 1].min() > -0.5 and pts[:, 1].max() < 1.0
    assert scene.point_cloud.colors.min() >= 0.0
    assert scene.point_cloud.colors.max() <= 1.0
    assert 3.0 < scene.cameras_extent < 7.0


@pytest.mark.slow
def test_structured_scene_heldout_psnr_improves(tmp_path, eight_devices):
    """Short sharded training on the structured scene must IMPROVE
    held-out PSNR over the init — the property the old clutter protocol
    lacked (its held-out PSNR was flat ~14 dB while train PSNR soared)."""
    from grendel_tpu.config import TrainConfig
    from grendel_tpu.engine.trainer import Trainer

    scene = StructuredSyntheticScene(width=160, height=112, n_cams=24,
                                     llffhold=8, n_init_points=4000, seed=0)
    cfg = TrainConfig()
    cfg.model.sh_degree = 1
    cfg.model.model_path = str(tmp_path)
    o = cfg.opt
    o.iterations = 150
    o.densify_from_iter = 40
    o.densification_interval = 50
    o.densify_until_iter = 120
    o.opacity_reset_interval = 10 ** 9
    cfg.dist.bsz = 2
    cfg.test_iterations = []
    cfg.save_iterations = []
    cfg.log_interval = 50
    cfg.quiet = True
    cfg = cfg.finalize()
    trainer = Trainer(cfg, scene, devices=eight_devices)
    r0 = trainer.eval_psnr(scene.test_cameras, sh_degree=0)
    trainer.train()
    r1 = trainer.eval_psnr(scene.test_cameras, sh_degree=1)
    assert r1["psnr"] > r0["psnr"] + 2.0, (r0, r1)
    assert np.isfinite(r1["l1"])


def test_cameras_interleave_by_true_azimuth():
    """The llffhold split property: sorting key is the TRUE azimuth in
    [0, 2pi) — the staggered rings' offsets must not unwrap past the seam
    (ADVICE r4), so held-out views sit between training views."""
    import numpy as np
    from grendel_tpu.testing import StructuredSyntheticScene

    sc = StructuredSyntheticScene(width=96, height=64, n_cams=24,
                                  n_init_points=500, seed=0)
    cams = sorted(sc.train_cameras + sc.test_cameras, key=lambda c: c.uid)
    az = [float(np.arctan2(c.camera_center[2], c.camera_center[0]))
          % (2 * np.pi) for c in cams]
    assert az == sorted(az), "uid order must be true-azimuth order"
