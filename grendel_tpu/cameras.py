"""Camera containers.

``Camera`` is host-side (numpy) scene metadata built by the dataset readers
(parity target: /root/reference/scene/cameras.py:16-133). ``CameraArrays``
is the device-side pytree consumed by the jitted render/train step; a batch
of cameras is a stacked CameraArrays (leading axis = batch).

GT images are kept as uint8 CHW on host and uploaded (possibly only the
tile-row span a device owns) per step, mirroring the reference's
CPU-resident ``original_image_backup`` design.
"""

from __future__ import annotations

import dataclasses
import os
from collections import OrderedDict
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .utils.math3d import world_to_view, perspective_projection

# Count of on-demand GT decodes across all cameras (observability for the
# distributed-dataset-storage policy: a host that stores only its stride of
# the dataset decodes the rest lazily; tests assert on this counter).
LAZY_DECODE_COUNT = [0]


class DecodedLru:
    """Byte-budgeted LRU of lazily-decoded GT images.

    Under --distributed_dataset_storage a host stores only its stride of
    the dataset; any other camera the balancer routes rows from decodes on
    demand. Without a cache that was a full JPEG decode per step per
    touched camera (~40ms at 1296x840, ~600ms at 4K — measured round 4),
    where the reference decodes once at load and P2P-ships row slices
    (loss_distribution.py:2444-2532). The budget (not an item count) keeps
    host memory bounded at 4K scale; within an epoch each camera is
    decoded at most once as long as the working set fits.
    """

    def __init__(self, max_bytes: Optional[int] = None):
        if max_bytes is None:
            max_bytes = int(os.environ.get(
                "GRENDEL_GT_CACHE_BYTES", 1 << 30))
        self.max_bytes = max_bytes
        self.bytes = 0
        # id(cam) -> (weakref(cam), img). The WEAK camera ref scopes the
        # cache to the cameras' (Scene's) lifetime: a finalizer evicts the
        # entry when the camera is collected, so a discarded Scene cannot
        # pin up to max_bytes of decoded images for process lifetime
        # (ADVICE r4). The weakref also keeps id(cam) unambiguous while
        # the entry lives.
        self._entries: OrderedDict = OrderedDict()
        # camera ids with a live weakref.finalize registered: a finalizer
        # is per-CAMERA, not per-insert — byte-budget eviction + re-decode
        # cycles must not accumulate finalize objects (they live until the
        # camera dies)
        self._finalized: set = set()

    def get(self, cam) -> Optional[np.ndarray]:
        k = id(cam)
        hit = self._entries.get(k)
        if hit is None:
            return None
        self._entries.move_to_end(k)
        return hit[1]

    def _on_camera_dead(self, k: int):
        self._finalized.discard(k)      # id may be reused by a new camera
        hit = self._entries.pop(k, None)
        if hit is not None:
            self.bytes -= hit[1].nbytes

    def put(self, cam, img: np.ndarray):
        import weakref

        if img.nbytes > self.max_bytes:
            return
        k = id(cam)
        if k in self._entries:
            self.bytes -= self._entries[k][1].nbytes
            ref = self._entries[k][0]
        else:
            ref = weakref.ref(cam)
            if k not in self._finalized:
                self._finalized.add(k)
                weakref.finalize(cam, self._on_camera_dead, k)
        self._entries[k] = (ref, img)
        self._entries.move_to_end(k)
        self.bytes += img.nbytes
        while self.bytes > self.max_bytes and self._entries:
            _, (_, old) = self._entries.popitem(last=False)
            self.bytes -= old.nbytes

    def clear(self):
        self._entries.clear()
        self.bytes = 0


GT_DECODE_CACHE = DecodedLru()


@dataclasses.dataclass
class Camera:
    uid: int
    image_name: str
    R: np.ndarray          # (3,3) camera-to-world rotation (COLMAP qvec2rotmat().T)
    T: np.ndarray          # (3,) world-to-camera translation
    fovx: float
    fovy: float
    width: int
    height: int
    gt_image_u8: Optional[np.ndarray] = None   # (3,H,W) uint8, host
    znear: float = 0.01
    zfar: float = 100.0
    trans: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0
    # --distributed_dataset_storage: cameras NOT stored on this host keep
    # gt_image_u8=None and carry a decoder instead; gt() decodes on demand
    # through the byte-budgeted GT_DECODE_CACHE LRU (the reference's
    # analogue stores GT only on node rank 0, scene/cameras.py:52-73, and
    # P2P-ships row slices per step)
    gt_loader: Optional[Callable[[], np.ndarray]] = None

    def __post_init__(self):
        self.world_view = world_to_view(self.R, self.T, self.trans, self.scale)
        proj = perspective_projection(self.znear, self.zfar, self.fovx, self.fovy)
        self.full_proj = (proj @ self.world_view).astype(np.float32)
        self.camera_center = np.linalg.inv(self.world_view)[:3, 3].astype(np.float32)

    def gt(self, cache: bool = True) -> Optional[np.ndarray]:
        """GT image, decoding on demand (LRU-cached) for lazily-stored
        cameras — the decode counter advances once per cache miss, so per
        epoch it is bounded by #cameras-touched, not #steps x bsz.

        ``cache=False`` reads through without INSERTING on a miss: eval
        sweeps over every camera would otherwise evict the training
        working set from the byte-budgeted LRU (ADVICE r4)."""
        if self.gt_image_u8 is not None:
            return self.gt_image_u8
        if self.gt_loader is not None:
            img = GT_DECODE_CACHE.get(self)
            if img is None:
                LAZY_DECODE_COUNT[0] += 1
                img = self.gt_loader()
                if cache:
                    GT_DECODE_CACHE.put(self, img)
            return img
        return None

    @property
    def tanfovx(self) -> float:
        return float(np.tan(self.fovx * 0.5))

    @property
    def tanfovy(self) -> float:
        return float(np.tan(self.fovy * 0.5))


@dataclasses.dataclass
class CameraArrays:
    """Device-side camera pytree. Stack with ``batch_camera_arrays`` for bsz>1."""

    viewmat: jnp.ndarray      # (4,4) or (B,4,4)
    full_proj: jnp.ndarray    # (4,4) or (B,4,4)
    campos: jnp.ndarray       # (3,)  or (B,3)
    tanfov: jnp.ndarray       # (2,)  or (B,2)  [tanfovx, tanfovy]

    def tree_flatten(self):
        return (self.viewmat, self.full_proj, self.campos, self.tanfov), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(
    CameraArrays,
    lambda c: c.tree_flatten(),
    CameraArrays.tree_unflatten,
)


def camera_arrays(cam: Camera) -> CameraArrays:
    return CameraArrays(
        viewmat=jnp.asarray(cam.world_view),
        full_proj=jnp.asarray(cam.full_proj),
        campos=jnp.asarray(cam.camera_center),
        tanfov=jnp.asarray([cam.tanfovx, cam.tanfovy], dtype=jnp.float32),
    )


def batch_camera_arrays(cams: list[Camera]) -> CameraArrays:
    """Stack host cameras into a batched CameraArrays (B leading axis)."""
    return CameraArrays(
        viewmat=jnp.asarray(np.stack([c.world_view for c in cams])),
        full_proj=jnp.asarray(np.stack([c.full_proj for c in cams])),
        campos=jnp.asarray(np.stack([c.camera_center for c in cams])),
        tanfov=jnp.asarray(
            np.stack([[c.tanfovx, c.tanfovy] for c in cams]), dtype=jnp.float32
        ),
    )
