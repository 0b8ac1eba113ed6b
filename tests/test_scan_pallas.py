"""Pallas multi-channel prefix scan == jnp.cumsum, bit for bit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grendel_tpu.ops.scan_pallas import LANES, ROWS, cumsum_i32_multi


@pytest.mark.parametrize("m", [LANES, 1024, ROWS * LANES,
                               ROWS * LANES + 128, 3 * ROWS * LANES + 896])
@pytest.mark.parametrize("n_channels", [1, 4])
def test_cumsum_matches_jnp(m, n_channels):
    rng = np.random.default_rng(m + n_channels)
    xs = [jnp.asarray(rng.integers(-1000, 1000, m, dtype=np.int32))
          for _ in range(n_channels)]
    outs = cumsum_i32_multi(xs, interpret=True)
    for x, o in zip(xs, outs):
        np.testing.assert_array_equal(np.asarray(o),
                                      np.asarray(jnp.cumsum(x)))


def test_cumsum_large_values_exact():
    """Telescoping delta buffers carry values up to the full int32 range of
    packed fields — the scan must be exact there too."""
    rng = np.random.default_rng(0)
    m = ROWS * LANES
    vals = rng.integers(0, 2 ** 30, 64, dtype=np.int64)
    starts = np.sort(rng.choice(m, 64, replace=False))
    buf = np.zeros(m, np.int64)
    buf[starts] = np.diff(vals, prepend=0)
    x = jnp.asarray(buf.astype(np.int32))
    (out,) = cumsum_i32_multi([x], interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.cumsum(buf))
