"""Native (C) runtime components, loaded through ctypes.

The compute path of this framework is JAX/Pallas; the host-side runtime
around it follows the reference's pattern of native data movement
(reference: CUDA extensions + multiprocess image staging). Currently:

  * ``pack_gt_rows_native`` — per-step GT tile-row packing into the
    per-device staging buffer (threaded memcpy; the Python fallback in
    parallel/division.py is a per-row numpy loop).

The shared library is compiled on first import with the system C compiler
(cc -O3 -shared -fPIC -pthread) into this package directory; failures fall
back to the numpy implementation transparently (``HAVE_NATIVE`` tells).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gtpack.c")
_LIB = os.path.join(_DIR, "_gtpack.so")

_lib = None


def _build() -> bool:
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-pthread",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True,
            )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.pack_gt_rows_native.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),   # images
            ctypes.c_void_p,                    # out
            ctypes.c_void_p,                    # division
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.pack_gt_rows_native.restype = None
        _lib = lib
        return lib
    except OSError:
        return None


HAVE_NATIVE = _load() is not None


def pack_gt_rows_c(
    images: Sequence[Optional[np.ndarray]],   # B x (3, H, W) uint8 or None
    division_pos: np.ndarray,                 # (D+1,) int32
    n_devices: int,
    max_rows: int,
    tile_h: int,
    img_h: int,
    img_w: int,
    n_threads: int = 8,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Threaded native GT row packing; same contract as
    parallel.division.pack_gt_rows."""
    lib = _load()
    assert lib is not None, "native gtpack unavailable"
    if out is None:
        out = np.empty((n_devices, max_rows, 3, tile_h, img_w), np.uint8)
    assert out.flags["C_CONTIGUOUS"]
    imgs: List[np.ndarray] = []
    ptrs = (ctypes.c_void_p * len(images))()
    for i, im in enumerate(images):
        if im is None:
            ptrs[i] = None
            continue
        im = np.ascontiguousarray(im, np.uint8)
        imgs.append(im)               # keep alive
        ptrs[i] = im.ctypes.data
    division = np.ascontiguousarray(division_pos, np.int32)
    lib.pack_gt_rows_native(
        ptrs, out.ctypes.data, division.ctypes.data,
        n_devices, max_rows, tile_h, img_h, img_w, n_threads,
    )
    return out
