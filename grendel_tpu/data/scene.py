"""Scene container + epoch-shuffled camera dataset.

Parity targets: /root/reference/scene/__init__.py — `Scene` (L28-178:
dataset dispatch, camera decode, cameras_extent radius) and `SceneDataset`
(L203-296: epoch-shuffled batch sampler with per-epoch loss logging).

Images are decoded once at load time to uint8 CHW host arrays (the
reference's CPU-resident ``original_image_backup``); per-step upload to
device happens in the training loop. Multi-host sharded dataset storage
(the reference's --distributed_dataset_storage) maps to each host decoding
only the cameras whose pixels its chips own; a ``decode_mask`` hook makes
that a caller policy.
"""

from __future__ import annotations

import os
import random
from typing import Callable, List, Optional, Sequence

import numpy as np

from ..cameras import Camera
from .readers import (
    CameraInfo,
    SceneInfo,
    read_blender_scene,
    read_colmap_scene,
)


def decode_image(info: CameraInfo) -> np.ndarray:
    """CameraInfo -> (3, H, W) uint8. Alpha composited over info.bg."""
    from PIL import Image

    with Image.open(info.image_path) as im:
        arr = np.asarray(im.convert("RGBA") if im.mode == "RGBA" else im)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] == 4:
        rgb = arr[..., :3].astype(np.float32) / 255.0
        alpha = arr[..., 3:4].astype(np.float32) / 255.0
        bg = info.bg if info.bg is not None else np.zeros(3)
        rgb = rgb * alpha + bg * (1.0 - alpha)
        arr = (rgb * 255.0 + 0.5).astype(np.uint8)
    return np.ascontiguousarray(arr[..., :3].transpose(2, 0, 1))


def camera_from_info(uid: int, info: CameraInfo,
                     decode: bool = True) -> Camera:
    return Camera(
        uid=uid,
        image_name=info.image_name,
        R=info.R,
        T=info.T,
        fovx=info.fovx,
        fovy=info.fovy,
        width=info.width,
        height=info.height,
        gt_image_u8=decode_image(info) if decode else None,
    )


class Scene:
    """Loaded scene: train/test cameras + init point cloud + extent."""

    def __init__(
        self,
        source_path: str,
        images: str = "images",
        eval_split: bool = False,
        llffhold: int = 8,
        white_background: bool = False,
        num_train: int = -1,
        num_test: int = -1,
        shuffle: bool = True,
        seed: int = 0,
        decode_mask: Optional[Callable[[int, CameraInfo], bool]] = None,
    ):
        if os.path.exists(os.path.join(source_path, "sparse")):
            info = read_colmap_scene(
                source_path, images, eval_split, llffhold, num_train, num_test
            )
        elif "matrixcity" in source_path.lower():
            # reference dispatch rule: scene/__init__.py:57
            from .readers import read_city_scene

            info = read_city_scene(source_path)
        elif os.path.exists(os.path.join(source_path, "transforms_train.json")):
            info = read_blender_scene(
                source_path, white_background, eval_split
            )
        else:
            raise ValueError(f"unrecognized scene directory: {source_path}")
        self.info: SceneInfo = info
        self.cameras_extent: float = info.nerf_normalization["radius"]
        self.point_cloud = info.point_cloud

        train_infos = list(info.train_cameras)
        if shuffle:
            # deterministic shuffle shared by all hosts (ref shuffles with
            # the globally-seeded RNG, scene/__init__.py:88-90)
            random.Random(seed).shuffle(train_infos)

        def build(infos: Sequence[CameraInfo]) -> List[Camera]:
            # parallel image decode (ref: the multiprocess decoding pool,
            # utils/camera_utils.py:92-115; PIL releases the GIL during
            # JPEG/PNG decompression so threads suffice here)
            from concurrent.futures import ThreadPoolExecutor

            decs = [decode_mask(i, ci) if decode_mask is not None else True
                    for i, ci in enumerate(infos)]
            with ThreadPoolExecutor(max_workers=8) as pool:
                return list(pool.map(
                    lambda t: camera_from_info(t[0], t[1], decode=t[2]),
                    zip(range(len(infos)), infos, decs)))

        self.train_cameras: List[Camera] = build(train_infos)
        self.test_cameras: List[Camera] = build(info.test_cameras)


class SceneDataset:
    """Epoch-shuffled infinite batch sampler over cameras (ref:
    scene/__init__.py:203-296)."""

    def __init__(self, cameras: List[Camera], seed: int = 0):
        assert len(cameras) > 0
        self.cameras = cameras
        self.rng = random.Random(seed)
        self._order: List[int] = []
        self._pos = 0
        self.epoch = 0
        self.iteration = 0

    def _refill(self):
        self._order = list(range(len(self.cameras)))
        self.rng.shuffle(self._order)
        self._pos = 0
        self.epoch += 1

    def next_batch(self, bsz: int) -> List[Camera]:
        out = []
        for _ in range(bsz):
            if self._pos >= len(self._order):
                self._refill()
            out.append(self.cameras[self._order[self._pos]])
            self._pos += 1
        self.iteration += bsz
        return out

    @property
    def epoch_len(self) -> int:
        return len(self.cameras)
