"""Export->reader round trip: the on-disk COLMAP export of the structured
scene reloads through the real pipeline (colmap parse -> reader -> Scene)
bit-identically in GT and to float precision in geometry (VERDICT r4 #4).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from grendel_tpu.testing import StructuredSyntheticScene
from grendel_tpu.data.scene import Scene
from grendel_tpu.data.colmap import qvec_to_rotmat, rotmat_to_qvec


def test_rotmat_qvec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = qvec_to_rotmat(q)
        q2 = rotmat_to_qvec(R)
        np.testing.assert_allclose(qvec_to_rotmat(q2), R, atol=1e-10)


def test_export_reload_matches_in_memory_scene(tmp_path):
    from export_structured_dataset import export_structured_dataset

    W, H, CAMS, PTS, SEED = 160, 96, 16, 2000, 0
    out = str(tmp_path / "ds")
    export_structured_dataset(out, W, H, CAMS, PTS, SEED)

    mem = StructuredSyntheticScene(width=W, height=H, n_cams=CAMS,
                                   n_init_points=PTS, seed=SEED)
    disk = Scene(out, eval_split=True, llffhold=8, shuffle=False)

    # the llffhold split survives the name-sorted reader ordering
    assert len(disk.train_cameras) == len(mem.train_cameras)
    assert len(disk.test_cameras) == len(mem.test_cameras)
    for dc, mc in zip(disk.train_cameras + disk.test_cameras,
                      mem.train_cameras + mem.test_cameras):
        assert dc.image_name == mc.image_name
        # geometry to float precision through qvec + binary float64
        np.testing.assert_allclose(dc.world_view, mc.world_view, atol=2e-5)
        np.testing.assert_allclose(dc.camera_center, mc.camera_center,
                                   atol=2e-4)
        assert abs(dc.tanfovx - mc.tanfovx) < 1e-6
        assert abs(dc.tanfovy - mc.tanfovy) < 1e-6
        # GT is bit-identical (PNG is lossless)
        np.testing.assert_array_equal(dc.gt(), mc.gt_image_u8)
    # init point cloud: positions via float64 bin, colors quantized u8
    np.testing.assert_allclose(disk.point_cloud.points,
                               mem.point_cloud.points, atol=1e-5)
    assert np.max(np.abs(disk.point_cloud.colors
                         - mem.point_cloud.colors)) < 1.0 / 255.0 + 1e-6
    # cameras_extent comes out equivalent (same camera set)
    assert abs(disk.cameras_extent - mem.cameras_extent) / mem.cameras_extent < 0.1
