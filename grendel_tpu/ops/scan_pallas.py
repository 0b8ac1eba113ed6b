"""Pallas TPU prefix-sum: multi-channel inclusive cumsum over flat int32
arrays.

Why: the tile-intersection stage broadcasts per-Gaussian attributes over
the entry axis as scatter-deltas + cumsum (ops/isect.py
_segment_broadcast — the gather-free expansion, DESIGN.md §5). XLA's TPU
cumsum lowering costs ~2.3 ms per million elements (reduce-window-shaped,
many HBM passes), and the expansion runs FOUR of them per step — ~9 ms at
garden scale, all for arrays whose bytes could stream through the VPU in
tens of microseconds. This kernel computes C channels in ONE sequential
pass: each grid step loads a (C, R, 128) block, does a lane-axis log-scan
plus a sublane-axis log-scan of row sums, adds the running per-channel
carry, and stores — bandwidth-bound by construction.

Exactness: int32 adds are associative — results are bit-identical to
jnp.cumsum. Zero padding (to the block multiple) contributes zero to
every carry, so padding + slicing back is exact.

The reference has no analogue: its duplication stage is a CUDA kernel
with hardware gather/scatter (SURVEY.md §2.9); the cumsum formulation is
the TPU-native replacement, and this kernel removes its main overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANES = 128
ROWS = 256            # sublane rows per grid step -> 32768 elems/step/channel


def _scan_lanes_i32(x):
    """Inclusive prefix sum along the last (lane) axis, log-step rolls."""
    k = x.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    shift = 1
    while shift < k:
        shifted = pltpu.roll(x, shift, axis=x.ndim - 1)
        x = x + jnp.where(cols >= shift, shifted, 0)
        shift *= 2
    return x


def _scan_sublanes_excl_i32(x):
    """EXCLUSIVE prefix sum along axis 0 of (R, 1) int32."""
    r = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    incl = x
    shift = 1
    while shift < r:
        shifted = pltpu.roll(incl, shift, axis=0)
        incl = incl + jnp.where(rows >= shift, shifted, 0)
        shift *= 2
    rolled = pltpu.roll(incl, 1, axis=0)
    return jnp.where(rows == 0, 0, rolled)


def _cumsum_kernel(off_ref, x_ref, out_ref, *, n_channels):
    b = pl.program_id(0)
    for c in range(n_channels):
        x = x_ref[c]                                   # (R, LANES)
        lane_scan = _scan_lanes_i32(x)
        row_tot = lane_scan[:, LANES - 1:LANES]        # (R, 1)
        row_pref = _scan_sublanes_excl_i32(row_tot)
        # cross-block offset arrives via SMEM (scalar prefetch): Mosaic
        # cannot store scalars to a VMEM carry, and an XLA block-sum +
        # tiny exclusive cumsum outside the kernel costs one extra
        # bandwidth pass while keeping the kernel carry-free
        out_ref[c] = lane_scan + row_pref + off_ref[c, b]


def cumsum_i32_multi(xs, interpret: bool = False) -> list:
    """Inclusive cumsum of each 1-D int32 array in ``xs`` (all the same
    length) in one fused pass. Bit-identical to jnp.cumsum."""
    n_channels = len(xs)
    m = xs[0].shape[0]
    stacked = jnp.stack([x.astype(jnp.int32) for x in xs])     # (C, M)
    block = ROWS * LANES
    m_pad = -(-m // block) * block
    if m_pad != m:
        stacked = jnp.pad(stacked, ((0, 0), (0, m_pad - m)))
    n_blocks = m_pad // block
    x3 = stacked.reshape(n_channels, n_blocks * ROWS, LANES)
    # exclusive per-block offsets (int32 adds: exact, any association)
    block_sums = x3.reshape(n_channels, n_blocks, ROWS * LANES).sum(
        axis=-1, dtype=jnp.int32)                              # (C, B)
    offsets = jnp.cumsum(block_sums, axis=1) - block_sums      # (C, B)

    kernel = functools.partial(_cumsum_kernel, n_channels=n_channels)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((n_channels, ROWS, LANES),
                               lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_channels, ROWS, LANES),
                               lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_channels, n_blocks * ROWS, LANES),
                                       jnp.int32),
        interpret=interpret,
    )(offsets, x3)
    flat = out.reshape(n_channels, m_pad)[:, :m]
    return [flat[c] for c in range(n_channels)]


def cumsum_i32(x: Array, interpret: bool = False) -> Array:
    """Single-channel convenience wrapper: Pallas scan on TPU, jnp.cumsum
    elsewhere (bit-identical either way)."""
    if use_pallas_scan():
        return cumsum_i32_multi([x], interpret=interpret)[0]
    return jnp.cumsum(x.astype(jnp.int32))


def use_pallas_scan() -> bool:
    """Pallas cumsum on real TPU backends only (interpret-mode scans are
    orders slower than jnp.cumsum on CPU)."""
    import os

    if os.environ.get("GRENDEL_NO_PALLAS_SCAN", "0") == "1":
        return False
    return jax.default_backend() == "tpu"
