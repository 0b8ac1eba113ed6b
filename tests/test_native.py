"""Native GT packing vs the numpy reference implementation."""

import numpy as np
import pytest

from grendel_tpu import native
from grendel_tpu.parallel.division import pack_gt_rows
from grendel_tpu.testing import make_test_camera


pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="C toolchain unavailable")


def _cams(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    cams = []
    for i in range(b):
        c = make_test_camera(w, h, angle=0.1 * i)
        c.gt_image_u8 = rng.integers(0, 255, (3, h, w), np.uint8)
        cams.append(c)
    return cams


@pytest.mark.parametrize("h,w,tile_h,d,bsz", [
    (48, 64, 16, 4, 2),      # partial bottom tile row (48 = 3 rows exact)
    (40, 64, 16, 3, 2),      # 40 -> 2.5 rows, padding in last
    (64, 48, 16, 8, 1),
])
def test_native_matches_numpy(h, w, tile_h, d, bsz):
    cams = _cams(bsz, h, w)
    tiles_y = -(-h // tile_h)
    total = bsz * tiles_y
    rng = np.random.default_rng(1)
    # random monotone division
    cuts = np.sort(rng.integers(0, total + 1, d - 1))
    pos = np.concatenate([[0], cuts, [total]]).astype(np.int32)
    max_rows = int(max(np.diff(pos).max(), 1)) + 1

    ref = pack_gt_rows(cams, pos, d, max_rows, tile_h, h, w)
    got = native.pack_gt_rows_c(
        [c.gt_image_u8 for c in cams], pos, d, max_rows, tile_h, h, w)
    np.testing.assert_array_equal(got, ref)


def test_native_handles_missing_images():
    cams = _cams(2, 32, 32)
    imgs = [cams[0].gt_image_u8, None]
    pos = np.array([0, 2, 4], np.int32)
    got = native.pack_gt_rows_c(imgs, pos, 2, 3, 16, 32, 32)
    cams[1].gt_image_u8 = None
    ref = pack_gt_rows(cams, pos, 2, 3, 16, 32, 32)
    np.testing.assert_array_equal(got, ref)
