"""Data-layer tests: PLY IO, COLMAP parsers, scene readers, dataset sampler."""

import json
import os

import numpy as np
import pytest

from grendel_tpu.utils.ply import read_ply, write_ply
from grendel_tpu.data import colmap
from grendel_tpu.data.readers import read_blender_scene, read_colmap_scene, nerfpp_norm
from grendel_tpu.data.scene import Scene, SceneDataset, decode_image


def test_ply_roundtrip(tmp_path):
    path = str(tmp_path / "t.ply")
    fields = {
        "x": np.arange(5, dtype=np.float32),
        "y": np.arange(5, dtype=np.float32) * 2,
        "z": np.arange(5, dtype=np.float32) * 3,
        "red": np.array([0, 64, 128, 192, 255], np.uint8),
        "green": np.zeros(5, np.uint8),
        "blue": np.ones(5, np.uint8),
    }
    write_ply(path, fields)
    back = read_ply(path)
    for k, v in fields.items():
        np.testing.assert_array_equal(back[k], v)


def test_colmap_binary_roundtrip(tmp_path):
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                               np.array([500.0, 510.0, 320.0, 240.0])),
    }
    q = np.array([0.9, 0.1, 0.2, 0.05])
    q = q / np.linalg.norm(q)
    imgs = {
        7: colmap.ColmapImage(7, q, np.array([1.0, 2.0, 3.0]), 1, "img_000.png"),
    }
    xyz = np.random.default_rng(0).normal(size=(10, 3))
    rgb = (np.random.default_rng(1).uniform(size=(10, 3)) * 255).astype(np.uint8)

    colmap.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    colmap.write_images_binary(str(tmp_path / "images.bin"), imgs)
    colmap.write_points3d_binary(str(tmp_path / "points3D.bin"), xyz, rgb)

    c2 = colmap.read_cameras_binary(str(tmp_path / "cameras.bin"))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    i2 = colmap.read_images_binary(str(tmp_path / "images.bin"))
    np.testing.assert_allclose(i2[7].qvec, q)
    assert i2[7].name == "img_000.png"
    x2, r2, _ = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)


def test_qvec_rotmat_orthonormal():
    q = np.array([0.7, 0.3, -0.2, 0.6])
    q = q / np.linalg.norm(q)
    R = colmap.qvec_to_rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)


def _write_png(path, h, w, color):
    from PIL import Image

    arr = np.full((h, w, 3), color, np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def colmap_scene_dir(tmp_path):
    """Build a minimal synthetic COLMAP scene directory."""
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    w, h = 64, 48
    fx = fy = 60.0
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", w, h,
                                   np.array([fx, fy, w / 2, h / 2]))}
    imgs = {}
    rng = np.random.default_rng(0)
    for i in range(10):
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        imgs[i + 1] = colmap.ColmapImage(
            i + 1, q, rng.normal(size=3) + [0, 0, 4], 1, f"im_{i:03d}.png"
        )
        _write_png(str(imgdir / f"im_{i:03d}.png"), h, w, 40 + 20 * (i % 3))
    xyz = rng.normal(size=(50, 3))
    rgb = (rng.uniform(size=(50, 3)) * 255).astype(np.uint8)
    colmap.write_cameras_binary(str(sparse / "cameras.bin"), cams)
    colmap.write_images_binary(str(sparse / "images.bin"), imgs)
    colmap.write_points3d_binary(str(sparse / "points3D.bin"), xyz, rgb)
    return tmp_path


def test_read_colmap_scene(colmap_scene_dir):
    info = read_colmap_scene(str(colmap_scene_dir), eval_split=True, llffhold=8)
    assert len(info.train_cameras) + len(info.test_cameras) == 10
    assert len(info.test_cameras) == 2  # indices 0 and 8
    assert info.point_cloud.points.shape == (50, 3)
    assert 0 <= info.point_cloud.colors.min() <= info.point_cloud.colors.max() <= 1
    assert info.nerf_normalization["radius"] > 0
    # names sorted deterministically
    names = [c.image_name for c in info.train_cameras]
    assert names == sorted(names)


def test_scene_and_dataset(colmap_scene_dir):
    scene = Scene(str(colmap_scene_dir), eval_split=True, llffhold=8, seed=3)
    assert len(scene.train_cameras) == 8
    assert scene.cameras_extent > 0
    cam = scene.train_cameras[0]
    assert cam.gt_image_u8.shape == (3, 48, 64)
    # full projection finite
    assert np.all(np.isfinite(cam.full_proj))

    ds = SceneDataset(scene.train_cameras, seed=0)
    seen = []
    for _ in range(4):
        batch = ds.next_batch(3)
        assert len(batch) == 3
        seen += [c.uid for c in batch]
    assert ds.epoch == 2  # 12 draws over 8 cameras
    # first epoch visits each camera exactly once
    assert sorted(seen[:8]) == list(range(8))


def test_resolve_resolution():
    from grendel_tpu.data.scene import resolve_resolution

    assert resolve_resolution(1296, 840, 1) == (1296, 840)
    assert resolve_resolution(1296, 840, 4) == (324, 210)
    assert resolve_resolution(1296, 840, -1) == (1296, 840)   # <=1600: as-is
    # auto-downscale wide images to 1600 (upstream-3DGS rule)
    assert resolve_resolution(5187, 3361, -1) == (1600, 1036)
    # float => target width
    assert resolve_resolution(1296, 840, 648) == (648, 420)


def test_scene_resolution_downscale(colmap_scene_dir):
    scene = Scene(str(colmap_scene_dir), eval_split=False, seed=3,
                  resolution=2)
    cam = scene.train_cameras[0]
    assert (cam.width, cam.height) == (32, 24)
    assert cam.gt_image_u8.shape == (3, 24, 32)
    # solid-color GT survives the resize exactly
    assert cam.gt_image_u8.min() == cam.gt_image_u8.max()
    # FoV unchanged (resolution-independent)
    full = Scene(str(colmap_scene_dir), eval_split=False, seed=3)
    by_name = {c.image_name: c for c in full.train_cameras}
    assert np.isclose(cam.fovx, by_name[cam.image_name].fovx)


@pytest.fixture
def blender_scene_dir(tmp_path):
    from PIL import Image

    frames = []
    rng = np.random.default_rng(2)
    (tmp_path / "train").mkdir()
    for i in range(4):
        c2w = np.eye(4)
        c2w[:3, 3] = rng.normal(size=3) + [0, 0, 3]
        frames.append({
            "file_path": f"train/r_{i}",
            "transform_matrix": c2w.tolist(),
        })
        arr = np.zeros((32, 40, 4), np.uint8)
        arr[..., 0] = 200
        arr[..., 3] = 128  # half-transparent
        Image.fromarray(arr).save(tmp_path / "train" / f"r_{i}.png")
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    return tmp_path


def test_read_blender_scene_white_bg(blender_scene_dir):
    info = read_blender_scene(str(blender_scene_dir), white_background=True,
                              eval_split=False)
    assert len(info.train_cameras) == 4
    img = decode_image(info.train_cameras[0])
    assert img.shape == (3, 32, 40)
    # alpha=0.5 composite over white: red = 0.5*200 + 0.5*255 ~ 227
    assert abs(int(img[0, 0, 0]) - 227) <= 1
    assert abs(int(img[1, 0, 0]) - 127) <= 1  # green 0 over white


def test_nerfpp_norm_radius():
    from grendel_tpu.data.readers import CameraInfo

    infos = []
    for pos in ([1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]):
        # camera at `pos` looking with identity rotation: T = -R^T @ pos = -pos
        infos.append(CameraInfo(
            uid=0, R=np.eye(3), T=-np.array(pos, np.float64),
            fovx=1.0, fovy=1.0, image_path="", image_name="", width=8, height=8,
        ))
    norm = nerfpp_norm(infos)
    np.testing.assert_allclose(norm["radius"], 1.1, rtol=1e-6)
    np.testing.assert_allclose(norm["translate"], 0.0, atol=1e-12)


@pytest.fixture
def city_scene_dir(tmp_path):
    """Minimal MatrixCity-style directory (per-frame pixel focals)."""
    from grendel_tpu.utils.ply import write_ply

    d = tmp_path / "matrixcity_small"
    d.mkdir()
    (d / "imgs").mkdir()
    rng = np.random.default_rng(4)
    frames = []
    for i in range(5):
        c2w = np.eye(4)
        c2w[:3, 3] = rng.normal(size=3) + [0, 0, 5]
        frames.append({
            "file_path": f"imgs/{i:04d}.png",
            "fl_x": 50.0, "fl_y": 50.0,
            "transform_matrix": c2w.tolist(),
        })
        _write_png(str(d / "imgs" / f"{i:04d}.png"), 24, 32, 90)
    with open(d / "transforms_train.json", "w") as f:
        json.dump({"frames": frames}, f)
    with open(d / "transforms_test.json", "w") as f:
        json.dump({"frames": frames[:2]}, f)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    write_ply(str(d / "tiepoints.ply"), {
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "red": np.full(20, 100, np.uint8),
        "green": np.full(20, 100, np.uint8),
        "blue": np.full(20, 100, np.uint8),
    })
    return d


def test_read_city_scene(city_scene_dir):
    from grendel_tpu.data.readers import read_city_scene

    info = read_city_scene(str(city_scene_dir))
    assert len(info.train_cameras) == 5
    assert len(info.test_cameras) == 2
    assert info.point_cloud.points.shape == (20, 3)
    cam = info.train_cameras[0]
    # fl=50px over 32px width -> fovx = 2*atan(16/50)
    np.testing.assert_allclose(cam.fovx, 2 * np.arctan(16 / 50.0), rtol=1e-6)
    assert cam.width == 32 and cam.height == 24

    scene = Scene(str(city_scene_dir))
    assert len(scene.train_cameras) == 5
    assert scene.train_cameras[0].gt_image_u8.shape == (3, 24, 32)


def test_scene_decode_mask_lazy_gt(colmap_scene_dir):
    """--distributed_dataset_storage policy: non-stored cameras keep
    gt_image_u8=None but decode on demand via Camera.gt() (exactly once
    per access, counted) and pack_gt_rows decodes only cameras whose rows
    land in the packed spans."""
    from grendel_tpu import cameras as cam_mod
    from grendel_tpu.parallel import pack_gt_rows

    scene = Scene(str(colmap_scene_dir), eval_split=False, shuffle=False,
                  decode_mask=lambda i, ci: i % 2 == 0)
    stored = [c.gt_image_u8 is not None for c in scene.train_cameras]
    assert stored == [i % 2 == 0 for i in range(len(scene.train_cameras))]

    lazy = scene.train_cameras[1]
    eager = scene.train_cameras[0]
    n0 = cam_mod.LAZY_DECODE_COUNT[0]
    img = lazy.gt()
    assert img.shape == eager.gt().shape == eager.gt_image_u8.shape
    assert cam_mod.LAZY_DECODE_COUNT[0] == n0 + 1   # eager.gt() is free

    # pack spans covering only camera 0's rows: no lazy decode happens
    h, w = eager.gt_image_u8.shape[1:]
    tiles_y = -(-h // 16)
    n1 = cam_mod.LAZY_DECODE_COUNT[0]
    pos = np.array([0, tiles_y], np.int32)          # rows of camera 0 only
    out = pack_gt_rows(scene.train_cameras[:2], pos, 1, tiles_y, 16, h, w)
    assert cam_mod.LAZY_DECODE_COUNT[0] == n1
    np.testing.assert_array_equal(
        out[0, 0, :, :, :], eager.gt_image_u8[:, :16, :])
    # spans touching camera 1's rows: served from the decoded-camera LRU
    # (camera 1 was already decoded above) — per epoch the decode count is
    # bounded by #cameras-touched, not #steps x bsz
    pos = np.array([0, 2 * tiles_y], np.int32)
    for _ in range(5):                               # 5 "steps"
        pack_gt_rows(scene.train_cameras[:2], pos, 1, 2 * tiles_y, 16, h, w)
    assert cam_mod.LAZY_DECODE_COUNT[0] == n1
    # evicting the cache forces exactly one fresh decode
    cam_mod.GT_DECODE_CACHE.clear()
    pack_gt_rows(scene.train_cameras[:2], pos, 1, 2 * tiles_y, 16, h, w)
    assert cam_mod.LAZY_DECODE_COUNT[0] == n1 + 1


def test_gt_decode_cache_byte_budget(colmap_scene_dir):
    """The decoded-camera LRU is byte-budgeted: the working set stays under
    max_bytes (the point of --distributed_dataset_storage is bounded host
    memory), evicting least-recently-used cameras first."""
    from grendel_tpu import cameras as cam_mod

    scene = Scene(str(colmap_scene_dir), eval_split=False, shuffle=False,
                  decode_mask=lambda i, ci: False)   # all lazy
    cams = scene.train_cameras
    img_bytes = cams[0].gt().nbytes
    lru = cam_mod.DecodedLru(max_bytes=2 * img_bytes)
    old = cam_mod.GT_DECODE_CACHE
    cam_mod.GT_DECODE_CACHE = lru
    try:
        n0 = cam_mod.LAZY_DECODE_COUNT[0]
        for c in cams[:3]:
            c.gt()
        assert lru.bytes <= lru.max_bytes           # bounded
        assert cam_mod.LAZY_DECODE_COUNT[0] == n0 + 3
        cams[2].gt(); cams[1].gt()                  # hits: 1 and 2 resident
        assert cam_mod.LAZY_DECODE_COUNT[0] == n0 + 3
        cams[0].gt()                                # evicted -> re-decode
        assert cam_mod.LAZY_DECODE_COUNT[0] == n0 + 4
        # read-through mode decodes but does NOT insert (eval sweeps must
        # not evict the training working set)
        resident = set(lru._entries)
        bytes_before = lru.bytes
        cams[3].gt(cache=False)
        assert cam_mod.LAZY_DECODE_COUNT[0] == n0 + 5
        assert set(lru._entries) == resident and lru.bytes == bytes_before
    finally:
        cam_mod.GT_DECODE_CACHE = old


def test_gt_decode_cache_released_with_scene(colmap_scene_dir):
    """The LRU holds cameras WEAKLY: when a Scene (and its cameras) is
    discarded, its decoded images leave the cache instead of staying
    pinned for process lifetime (ADVICE r4)."""
    import gc

    from grendel_tpu import cameras as cam_mod

    lru = cam_mod.DecodedLru(max_bytes=1 << 30)
    old = cam_mod.GT_DECODE_CACHE
    cam_mod.GT_DECODE_CACHE = lru
    try:
        scene = Scene(str(colmap_scene_dir), eval_split=False, shuffle=False,
                      decode_mask=lambda i, ci: False)
        for c in scene.train_cameras[:3]:
            c.gt()
        assert lru.bytes > 0
        del scene, c
        gc.collect()
        assert lru.bytes == 0 and not lru._entries
    finally:
        cam_mod.GT_DECODE_CACHE = old


def test_train_cli_accepts_reference_flag_surface(tmp_path):
    """A Grendel-GS-style command line parses and lands in the config
    (the flag-name surface is part of the compatibility contract)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from train import args_to_config, build_parser

    argv = [
        "-s", "scene", "-m", str(tmp_path), "--eval", "--llffhold", "8",
        "--bsz", "4", "--backend", "default", "--iterations", "30000",
        "--image_distribution_mode", "final",
        "--border_divpos_coeff", "2.0",
        "--densify_memory_limit_percentage", "0.8",
        "--lr_scale_pos_and_scale", "1.5",
        "--sync_grad_mode", "sparse",
        "--grad_normalization_mode", "divide_by_visible_count",
        "--zhx_time", "--zhx_debug", "--end2end_time", "1",
        "--check_gpu_memory", "--check_cpu_memory", "--log_memory_summary",
        "--nsys_profile", "--detect_anomaly", "--quiet",
        "--log_folder", str(tmp_path / "logs"),
        "--multiprocesses_image_loading", "0", "--time_image_loading",
        "--drop_duplicate_gaussians_coeff", "2.0",
        "--distributed_dataset_storage", "1", "--local_sampling",
    ]
    a = build_parser().parse_args(argv)
    cfg = args_to_config(a)
    assert cfg.pipeline.backend == "auto"        # ref 'default' mapped
    assert cfg.dist.border_divpos_coeff == 2.0
    assert cfg.opt.densify_memory_limit_percentage == 0.8
    assert cfg.opt.lr_scale_pos_and_scale == 1.5
    assert cfg.dist.sync_grad_mode == "sparse"
    assert cfg.dist.grad_normalization_mode == "divide_by_visible_count"
    assert cfg.enable_timer and cfg.pipeline.debug   # zhx aliases
    assert cfg.quiet and cfg.nsys_profile and cfg.check_gpu_memory
    assert cfg.log_folder == str(tmp_path / "logs")
    assert cfg.drop_duplicate_gaussians_coeff == 2.0
    # gsplat backend name maps to the pure-XLA backend
    a2 = build_parser().parse_args(["-s", "x", "--backend", "gsplat"])
    assert args_to_config(a2).pipeline.backend == "jax"
    # tile geometry flag (TPU tunable; default is the measured 32x16)
    assert cfg.pipeline.tile_w == 32 and cfg.pipeline.tile_h == 16
    a3 = build_parser().parse_args(["-s", "x", "--tile", "16x16"])
    cfg3 = args_to_config(a3)
    assert cfg3.pipeline.tile_w == 16 and cfg3.pipeline.tile_h == 16
