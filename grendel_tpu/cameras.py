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
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .utils.math3d import world_to_view, perspective_projection

# Count of on-demand GT decodes across all cameras (observability for the
# distributed-dataset-storage policy: a host that stores only its stride of
# the dataset decodes the rest lazily; tests assert on this counter).
LAZY_DECODE_COUNT = [0]


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
    # without caching (the reference's analogue stores GT only on node
    # rank 0, scene/cameras.py:52-73, and P2P-ships row slices per step)
    gt_loader: Optional[Callable[[], np.ndarray]] = None

    def __post_init__(self):
        self.world_view = world_to_view(self.R, self.T, self.trans, self.scale)
        proj = perspective_projection(self.znear, self.zfar, self.fovx, self.fovy)
        self.full_proj = (proj @ self.world_view).astype(np.float32)
        self.camera_center = np.linalg.inv(self.world_view)[:3, 3].astype(np.float32)

    def gt(self) -> Optional[np.ndarray]:
        """GT image, decoding on demand for lazily-stored cameras."""
        if self.gt_image_u8 is not None:
            return self.gt_image_u8
        if self.gt_loader is not None:
            LAZY_DECODE_COUNT[0] += 1
            return self.gt_loader()
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
