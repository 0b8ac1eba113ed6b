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


def resolve_resolution(orig_w: int, orig_h: int,
                       resolution: float = -1.0) -> tuple:
    """Target (w, h) for GT decode under the ``--resolution/-r`` flag.

    Upstream-3DGS semantics (the nyu fork removed this and pre-scales
    directories instead — camera_utils.py:34 "we do not support
    downsampling here" — but the benchmark protocol depends on it):
      * 1/2/4/8 — integer downscale divider;
      * -1      — auto: images wider than 1600px are scaled to width 1600;
      * other   — treated as a target width (orig_w / r is the divider).
    """
    if resolution in (1, 1.0):
        return orig_w, orig_h
    if resolution in (2, 4, 8, 2.0, 4.0, 8.0):
        d = float(resolution)
    elif resolution == -1:
        d = orig_w / 1600.0 if orig_w > 1600 else 1.0
    else:
        d = orig_w / float(resolution)
    return max(1, int(orig_w / d)), max(1, int(orig_h / d))


def decode_image(info: CameraInfo, size: Optional[tuple] = None) -> np.ndarray:
    """CameraInfo -> (3, H, W) uint8. Alpha composited over info.bg.

    ``size`` = (w, h) resizes at decode (the reference resizes inside
    PILtoTorch, general_utils.py:348-352)."""
    from PIL import Image

    with Image.open(info.image_path) as im:
        if size is not None and size != (im.width, im.height):
            im = im.resize(size, Image.BILINEAR)
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


def camera_from_info(uid: int, info: CameraInfo, decode: bool = True,
                     size: Optional[tuple] = None) -> Camera:
    w, h = size if size is not None else (info.width, info.height)
    return Camera(
        uid=uid,
        image_name=info.image_name,
        R=info.R,
        T=info.T,
        fovx=info.fovx,   # FoV is resolution-independent under uniform scale
        fovy=info.fovy,
        width=w,
        height=h,
        gt_image_u8=decode_image(info, size=size) if decode else None,
        # non-stored cameras can still decode on demand (Camera.gt()) —
        # correctness is preserved when the load balancer routes one of
        # their rows to this host (ref stores GT on node rank 0 only and
        # ships row slices per step, loss_distribution.py:2444-2532)
        gt_loader=(None if decode
                   else lambda info=info, size=size: decode_image(info, size)),
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
        resolution: float = -1.0,
        decode_workers: int = 8,
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

        all_infos = list(info.train_cameras) + list(info.test_cameras)
        if all_infos:
            w0, h0 = all_infos[0].width, all_infos[0].height
            self.resolution_wh = resolve_resolution(w0, h0, resolution)
            if self.resolution_wh != (w0, h0):
                print(f"[scene] decoding GT at {self.resolution_wh[0]}x"
                      f"{self.resolution_wh[1]} (source {w0}x{h0}, "
                      f"resolution={resolution})", flush=True)
        else:
            self.resolution_wh = None

        train_infos = list(info.train_cameras)
        if shuffle:
            # deterministic shuffle shared by all hosts (ref shuffles with
            # the globally-seeded RNG, scene/__init__.py:88-90)
            random.Random(seed).shuffle(train_infos)

        def build(infos: Sequence[CameraInfo]) -> List[Camera]:
            # parallel image decode (ref: the multiprocess decoding pool,
            # utils/camera_utils.py:92-115 / --multiprocesses_image_loading;
            # PIL releases the GIL during JPEG/PNG decompression so threads
            # suffice here)
            from concurrent.futures import ThreadPoolExecutor

            decs = [decode_mask(i, ci) if decode_mask is not None else True
                    for i, ci in enumerate(infos)]
            size = self.resolution_wh
            workers = max(1, decode_workers)
            with ThreadPoolExecutor(max_workers=workers) as pool:
                return list(pool.map(
                    lambda t: camera_from_info(t[0], t[1], decode=t[2],
                                               size=size),
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

    def next_batch_grouped(self, bsz: int, n_groups: int) -> List[Camera]:
        """Batch for --local_sampling: position j draws from group
        j // (bsz/n_groups), where camera c belongs to group c.uid %
        n_groups (the reference's rank-local store + per-rank sampling,
        scene/cameras.py:54-57 + train_internal.py:113-132). Each group
        keeps its own epoch-shuffled stream."""
        assert bsz % n_groups == 0, (
            "local_sampling needs bsz divisible by the device count "
            f"(got bsz={bsz}, D={n_groups})")  # ref train_internal.py:114-116
        if getattr(self, "_group_streams", None) is None or \
                len(self._group_streams) != n_groups:
            self._group_streams = [
                {"idx": [i for i, c in enumerate(self.cameras)
                         if c.uid % n_groups == g],
                 "order": [], "pos": 0}
                for g in range(n_groups)
            ]
            for s in self._group_streams:
                assert s["idx"], "a device's local camera store is empty"
        out = []
        per = bsz // n_groups
        for s in self._group_streams:
            for _ in range(per):
                if s["pos"] >= len(s["order"]):
                    s["order"] = list(s["idx"])
                    self.rng.shuffle(s["order"])
                    s["pos"] = 0
                out.append(self.cameras[s["order"][s["pos"]]])
                s["pos"] += 1
        self.iteration += bsz
        return out

    @property
    def epoch_len(self) -> int:
        return len(self.cameras)
