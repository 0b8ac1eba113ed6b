"""Pallas TPU rasterizer: per-tile front-to-back alpha blending kernels.

Drop-in replacement for :func:`rasterize_jax.rasterize_slots` (same
contract, validated against it in tests) — the TPU counterpart of the
reference's CUDA ``render_gaussians`` forward/backward (SURVEY.md §2.9).

Design (why it beats the pure-JAX path):
  * the per-entry payload is gathered ONCE into a COMPACT chunked array
    (cap/CHUNK, 16, CHUNK) in entry order — exactly one XLA row-gather of
    ``capacity`` indices. (The previous per-tile chunk-ALIGNED layout
    needed a second 4-byte id gather plus a 1.3-2.6x larger row gather;
    XLA TPU gathers cost ~10-13 ns PER INDEX regardless of row width, so
    at 2M entries that alignment was ~100 ms/step — measured round 2,
    see DESIGN.md §7. Index count is the only thing that matters.)
  * tiles walk their UNALIGNED entry span [lo, hi): the kernel DMAs the
    aligned enclosing chunks and masks out-of-span lanes. A chunk on a
    tile boundary is streamed by both neighbors (at most one extra chunk
    per tile).
  * the grid is one program per tile slot, executed sequentially on the
    TensorCore: each tile walks only ITS OWN chunk count (a dynamic trip
    count on the scalar core), so total work is sum(entries) instead of
    num_tiles * max_per_tile;
  * the forward early-exits a tile once every pixel saturates
    (transmittance < 1e-4) — the front-to-back stop rule of the reference;
  * the backward re-walks front-to-back, reconstructing each entry's
    incoming transmittance and the "color contributed after me" term as
    ``colors_out - running_prefix`` — no back-to-front pass, no divisions
    by tiny transmittances, no atomics. Gradients land in a d_payload
    array of the same compact layout; the one chunk shared with the
    PREVIOUS tile is read-modify-written (the sequential grid makes that
    race-free), every other chunk is written exactly once. A single
    segment-sum over ``gauss_ids`` scatters entry grads back to Gaussians
    (positions past the true entry count get a sentinel id and drop).

In-kernel orientation: pixels on sublanes (P = tile_h*tile_w rows),
entries on lanes (CHUNK = 128 cols). Alpha/transmittance prefix products
run along lanes via log-step shifts (Mosaic has no cumsum lowering).

Payload chunk layout (16, CHUNK) f32 rows:
  [0] x  [1] y  [2] conic_a  [3] conic_b  [4] conic_c
  [5] r  [6] g  [7] b  [8] opacity  [9..15] zero padding
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
PAYLOAD_W = 16
CHUNK = 128

# Backward-kernel pixel reductions + prefix scan: exact VPU f32 by
# default. The round-3 measurement story, in order:
#   * MXU single-pass bf16 reductions are ~3ms/step faster than the VPU
#     scans at garden scale, but a 2-seed training A/B measured the
#     rounding costing ~0.5-0.7 dB final PSNR;
#   * Precision.HIGHEST (6-pass bf16 emulation) is gradient-exact to
#     1.8e-7 but SLOWER than the plain VPU scans at the tuned capacity
#     (53.9 vs 50.8 ms fwd+bwd) — the emulation passes eat the win;
#   * Mosaic does not lower Precision.HIGH (3-pass), so there is no
#     middle tier.
# => default = exact VPU (bit-exact AND fastest exact option).
# GRENDEL_FAST_BWD_REDUCE=1 opts into the single-pass bf16 MXU route for
# the ~3ms/step, quality tradeoff documented in ROUND3_NOTES.md.
# (GRENDEL_EXACT_BWD_REDUCE=1 is still accepted and forces exact.)
import os as _os
_MXU_BWD_REDUCE = (
    _os.environ.get("GRENDEL_FAST_BWD_REDUCE", "0") == "1"
    and _os.environ.get("GRENDEL_EXACT_BWD_REDUCE", "0") != "1")
_MXU_PRECISION = jax.lax.Precision.DEFAULT


def _cumsum_lanes(x):
    """Inclusive prefix sum along the last (lane) axis via log-step rolls."""
    k = x.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    shift = 1
    while shift < k:
        shifted = pltpu.roll(x, shift, axis=x.ndim - 1)
        x = x + jnp.where(cols >= shift, shifted, 0.0)
        shift *= 2
    return x


def _excl_from_incl(incl, t_unit):
    """Exclusive prefix product from the inclusive one: shift lanes right by
    one and put 1.0 in lane 0 (avoids division entirely)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, incl.shape, incl.ndim - 1)
    rolled = pltpu.roll(incl, 1, axis=incl.ndim - 1)
    return jnp.where(cols == 0, t_unit, rolled)


def _precise_recip(x):
    """Reciprocal with one Newton refinement (Mosaic's f32 divide lowers to
    an approximate reciprocal with ~1e-3 error; one step brings ~1e-7)."""
    r = 1.0 / x
    return r * (2.0 - x * r)


def _cumprod_lanes(x):
    """Inclusive prefix product along the last (lane) axis (log-step rolls;
    exact f32 multiplies — no exp/log, so numerics match the JAX path's
    cumprod up to reassociation)."""
    k = x.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    shift = 1
    while shift < k:
        shifted = pltpu.roll(x, shift, axis=x.ndim - 1)
        x = x * jnp.where(cols >= shift, shifted, 1.0)
        shift *= 2
    return x


def _tree_sum_rows(x):
    """Sum over the sublane (pixel) axis by explicit geometric halving:
    each level adds two STATIC half-slices, so level L touches P/2^L rows
    — ~2x the (P,K) work total, vs a log-tree that keeps the full shape
    at every level. P is a power of two here (tile_w*tile_h in
    {256, 512, 1024})."""
    p = x.shape[0]
    if p & (p - 1):                       # non-pow2 guard: plain reduce
        return jnp.sum(x, axis=0, keepdims=True)
    while p > 1:
        h = p // 2
        x = x[:h] + x[h:p]
        p = h
    return x


def _pixel_grid(px0, py0, tile_w: int, tile_h: int):
    """(P, 1) pixel coordinates of a tile at origin (px0, py0)."""
    p = tile_w * tile_h
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = px0.astype(jnp.float32) + (idx % tile_w).astype(jnp.float32)
    py = py0.astype(jnp.float32) + (idx // tile_w).astype(jnp.float32)
    return px, py


def _chunk_alpha(chunk, px, py, lane_keep):
    """Alpha (P, K) of one payload chunk with the reference skip rules.

    chunk: (16, K) attribute rows; px/py: (P, 1); ``lane_keep`` (1, K)
    masks lanes outside this tile's [lo, hi_eff) span (compact layout:
    a chunk may carry neighbors' entries and max_per_tile-capped tails).

    Also returns e_pow = exp(power) so the backward reuses the forward's
    transcendental (power <= 0 is tested as e_pow <= 1, exact by
    monotonicity).
    """
    x = chunk[0:1, :]          # (1, K)
    y = chunk[1:2, :]
    ca = chunk[2:3, :]
    cb = chunk[3:4, :]
    cc = chunk[4:5, :]
    op = chunk[8:9, :]
    dx = px - x                # (P, K)
    dy = py - y
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    e_pow = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_CLAMP, op * e_pow)
    keep = (e_pow <= 1.0) & (alpha >= ALPHA_MIN) & lane_keep
    return jnp.where(keep, alpha, 0.0), dx, dy, e_pow


def _span_lane_keep(q, lo, hi_eff):
    """(1, CHUNK) mask of lanes of global chunk q inside [lo, hi_eff)."""
    epos = q * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return (epos >= lo) & (epos < hi_eff)


def _fwd_kernel(
    tile_lo_ref, tile_hi_ref, px0_ref, py0_ref,   # scalar prefetch
    payload_hbm,                       # (cap/CHUNK, 16, CHUNK) ANY
    color_out,                         # (1, P, 4) VMEM block
    t_out,                             # (1, P, 1) VMEM block
    chunk_vmem, sem,                   # scratch
    *, tile_w: int, tile_h: int, max_per_tile: int,
):
    t = pl.program_id(0)
    p = tile_w * tile_h
    lo = tile_lo_ref[t]
    hi = tile_hi_ref[t]
    hi_eff = jnp.minimum(hi, lo + max_per_tile)
    c0 = lo // CHUNK
    n_chunks = jnp.where(hi_eff > lo, (hi_eff + CHUNK - 1) // CHUNK - c0, 0)
    px, py = _pixel_grid(px0_ref[t], py0_ref[t], tile_w, tile_h)

    def in_copy(c):
        return pltpu.make_async_copy(
            payload_hbm.at[c0 + c], chunk_vmem.at[c % 2], sem.at[c % 2])

    @pl.when(n_chunks > 0)
    def _():
        in_copy(0).start()

    def body(carry):
        c, t_in, acc_l = carry
        # double buffering: prefetch chunk c+1 while blending chunk c
        @pl.when(c + 1 < n_chunks)
        def _():
            in_copy(c + 1).start()

        in_copy(c).wait()
        chunk = chunk_vmem[c % 2]
        lane_keep = _span_lane_keep(c0 + c, lo, hi_eff)
        alpha, _, _, _ = _chunk_alpha(chunk, px, py, lane_keep)   # (P, K)
        one_minus = 1.0 - alpha                            # >= 0.01
        cump = _cumprod_lanes(one_minus)
        t_after = t_in * cump                              # (P, K)
        include = t_after >= T_EPS
        t_before = t_in * _excl_from_incl(cump, 1.0)
        w = jnp.where(include, alpha * t_before, 0.0)      # (P, K)
        rgb = chunk[5:8, :]                                # (3, K)
        # exact f32 VPU accumulation, DEFERRED: per-lane partial sums
        # accumulate across chunks and reduce over lanes ONCE after the
        # walk — the three per-chunk 7-step lane-reduction trees were
        # ~25% of the kernel's vector issues. (An MXU dot here was
        # measured neutral in round 3 — the win is skipping reductions,
        # not moving them.)
        acc_l = acc_l + w[None, :, :] * rgb[:, None, :]    # (3, P, K)
        t_in = jnp.min(jnp.where(include, t_after, t_in), axis=1,
                       keepdims=True)                      # (P, 1)
        return c + 1, t_in, acc_l

    def cond(carry):
        c, t_in, _ = carry
        return (c < n_chunks) & (jnp.max(t_in) >= T_EPS)

    init = (jnp.int32(0), jnp.ones((p, 1), jnp.float32),
            jnp.zeros((3, p, CHUNK), jnp.float32))
    c_stop, t_fin, acc_l = jax.lax.while_loop(cond, body, init)
    acc = jnp.concatenate(
        [jnp.sum(acc_l[0], axis=1, keepdims=True),
         jnp.sum(acc_l[1], axis=1, keepdims=True),
         jnp.sum(acc_l[2], axis=1, keepdims=True),
         jnp.zeros((p, 1), jnp.float32)], axis=1)          # (P, 4)

    # Saturation early-exit (c_stop < n_chunks) leaves the in_copy(c_stop)
    # prefetch started by body c_stop-1 un-waited; its semaphore signal
    # would leak into the next grid step's first wait, which would then
    # read a chunk slot before its DMA lands. Drain it here. (c_stop > 0
    # guard: with n_chunks > 0 the body always runs at least once, and at
    # c_stop == 0 nothing beyond in_copy(0) was started.)
    @pl.when((c_stop < n_chunks) & (c_stop > 0))
    def _():
        in_copy(c_stop).wait()

    color_out[0] = acc
    t_out[0] = t_fin


def _bwd_kernel(
    tile_lo_ref, tile_hi_ref, px0_ref, py0_ref,   # scalar prefetch
    payload_hbm,                       # (cap/CHUNK, 16, CHUNK) ANY
    ct_ref,                            # (1, P, 4) VMEM: c_total (fwd colors4)
    g_ref,                             # (1, P, 3) VMEM: d(colors) cotangent
    gt_ref,                            # (1, 1, P) VMEM: T_fin * dT per pixel
    d_payload_hbm,                     # (cap/CHUNK, 16, CHUNK) ANY out
    chunk_vmem, dchunk_vmem, prev_vmem, sem, sem_out, sem_prev,
    *, tile_w: int, tile_h: int, max_per_tile: int,
):
    t = pl.program_id(0)
    p = tile_w * tile_h
    lo = tile_lo_ref[t]
    hi = tile_hi_ref[t]
    hi_eff = jnp.minimum(hi, lo + max_per_tile)
    c0 = lo // CHUNK
    # the tile must WRITE every chunk its span [lo, hi) touches (zeros for
    # capped/early-exited entries), so the next tile's read-modify-write of
    # the shared boundary chunk always reads initialized memory
    n_chunks_full = jnp.where(hi > lo, (hi + CHUNK - 1) // CHUNK - c0, 0)
    n_chunks = jnp.where(hi_eff > lo,
                         (hi_eff + CHUNK - 1) // CHUNK - c0, 0)
    px, py = _pixel_grid(px0_ref[t], py0_ref[t], tile_w, tile_h)
    # does chunk c0 carry a previous tile's entries? then accumulate into it
    shared_head = (lo % CHUNK) != 0

    # separate refs instead of one packed (1,P,8) aux: the host-side pack
    # cost a concat + a minor-dim-1 (T,P,1) multiply at 1/128 lane
    # utilization (~6.6ms at garden scale, traced round 3)
    ct = ct_ref[0]                     # (P, 4)
    g = g_ref[0]                       # (P, 3)
    ct_r = ct[:, 0:1]
    ct_g = ct[:, 1:2]
    ct_b = ct[:, 2:3]
    g_r = g[:, 0:1]
    g_g = g[:, 1:2]
    g_b = g[:, 2:3]
    gt = gt_ref[0].reshape(p, 1)       # (1,P) -> (P, 1) — already * T_fin
    # g . c_total, loop-invariant per pixel
    ctg = ct_r * g_r + ct_g * g_g + ct_b * g_b

    def in_copy(c):
        return pltpu.make_async_copy(
            payload_hbm.at[c0 + c], chunk_vmem.at[c % 2], sem.at[c % 2])

    def out_copy(c):
        return pltpu.make_async_copy(
            dchunk_vmem.at[c % 2], d_payload_hbm.at[c0 + c],
            sem_out.at[c % 2])

    prev_copy = pltpu.make_async_copy(
        d_payload_hbm.at[c0], prev_vmem, sem_prev)

    @pl.when(n_chunks_full > 0)
    def _():
        in_copy(0).start()

    @pl.when(shared_head & (n_chunks_full > 0))
    def _():
        prev_copy.start()

    def grads_of_chunk(c, t_in, s_pref):
        chunk = chunk_vmem[c % 2]
        lane_keep = _span_lane_keep(c0 + c, lo, hi_eff)
        alpha, dx, dy, g_exp = _chunk_alpha(chunk, px, py, lane_keep)
        one_minus = 1.0 - alpha                            # >= 0.01
        cump = _cumprod_lanes(one_minus)
        t_after = t_in * cump
        include = t_after >= T_EPS
        t_before = t_in * _excl_from_incl(cump, 1.0)
        w = jnp.where(include, alpha * t_before, 0.0)       # (P, K)
        rgb = chunk[5:8, :]                                 # (3, K)

        # dL/dalpha_i = g.(T_i c_i) - [g.B_i + T_fin*dL/dT_fin]/(1-a_i)
        # with B_i = c_total - prefix_i. Only g.B_i is needed, so a single
        # prefix scan of w * (g . c) suffices (instead of one per channel).
        c_dot_g = rgb[0:1, :] * g_r + rgb[1:2, :] * g_g + rgb[2:3, :] * g_b
        wc = w * c_dot_g
        if _MXU_BWD_REDUCE:
            # prefix sum along lanes as ONE (P,K)x(K,K) upper-triangular
            # matmul on the MXU instead of a 7-step roll scan (~20% of the
            # kernel's vector issues). Rounds through bf16 like the other
            # MXU reductions in this mode — same tolerance band; the exact
            # mode below keeps the f32 scan (the cancellation ctg - s_incl
            # is where rounding shows up first).
            k = wc.shape[-1]
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            cols_j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
            upper = (rows_i <= cols_j).astype(jnp.float32)
            s_incl = s_pref + jax.lax.dot_general(
                wc, upper, (((1,), (0,)), ((), ())),
                precision=_MXU_PRECISION,
                preferred_element_type=jnp.float32)         # (P, K)
        else:
            # exact f32 — it feeds the cancellation ctg - s_incl, where
            # bf16 MXU rounding measurably corrupts d_alpha (median m2d
            # grad error >1e-4 on hardware)
            s_incl = s_pref + _cumsum_lanes(wc)             # (P, K)
        b_dot_g = ctg - s_incl
        inv_om = _precise_recip(one_minus)
        d_alpha = jnp.where(
            include, t_before * c_dot_g - inv_om * (b_dot_g + gt), 0.0)

        # alpha = min(0.99, o * exp(power)); clamped/skipped entries get 0.
        # (g_exp reused from the alpha evaluation — no second exp)
        not_clamped = (chunk[8:9, :] * g_exp) < ALPHA_CLAMP
        live = (alpha > 0.0) & not_clamped
        d_alpha = jnp.where(live, d_alpha, 0.0)
        d_power = d_alpha * alpha                            # o e^p == alpha
        ca = chunk[2:3, :]
        cb = chunk[3:4, :]
        cc = chunk[4:5, :]
        d_dx = d_power * (-ca * dx - cb * dy)
        d_dy = d_power * (-cc * dy - cb * dx)
        terms = [
            -d_dx,                          # d_x   (dx = px - x)
            -d_dy,                          # d_y
            d_power * (-0.5 * dx * dx),     # d_ca
            d_power * (-dx * dy),           # d_cb
            d_power * (-0.5 * dy * dy),     # d_cc
            w * g_r, w * g_g, w * g_b,      # d_rgb
            d_alpha * g_exp,                # d_o
        ]
        if _MXU_BWD_REDUCE:
            # one (1, P) x (P, 9K) MXU matmul replaces nine log-step
            # sublane reduction trees (~38% of the bwd kernel's vector
            # issues; gradients round through bf16 — see module note)
            stacked = jnp.concatenate(terms, axis=1)           # (P, 9K)
            ones_row = jnp.ones((1, p), jnp.float32)
            summed = jax.lax.dot_general(
                ones_row, stacked, (((1,), (0,)), ((), ())),
                precision=_MXU_PRECISION,
                preferred_element_type=jnp.float32)            # (1, 9K)
            rows = summed.reshape(9, CHUNK)
            d_chunk = jnp.concatenate(
                [rows, jnp.zeros((PAYLOAD_W - 9, CHUNK), jnp.float32)],
                axis=0)
        else:
            rows = [_tree_sum_rows(t_) for t_ in terms]
            d_chunk = jnp.concatenate(
                rows + [jnp.zeros((PAYLOAD_W - 9, CHUNK), jnp.float32)],
                axis=0)
        t_in = jnp.min(jnp.where(include, t_after, t_in), axis=1,
                       keepdims=True)
        if _MXU_BWD_REDUCE:
            s_pref = s_incl[:, -1:]     # inclusive prefix's last lane
        else:
            s_pref = s_pref + jnp.sum(wc, axis=1, keepdims=True)
        return d_chunk, t_in, s_pref

    def emit(c, d_chunk):
        """Stage d_chunk for writing out chunk c (accumulating the previous
        tile's partial grads into the shared head chunk)."""
        # drain the out-copy that used this slot two iterations ago
        @pl.when(c >= 2)
        def _():
            out_copy(c - 2).wait()

        @pl.when(shared_head & (c == 0))
        def _():
            prev_copy.wait()

        dchunk_vmem[c % 2] = jnp.where(
            shared_head & (c == 0), d_chunk + prev_vmem[...], d_chunk)
        out_copy(c).start()

    def body(carry):
        c, t_in, s_pref = carry
        # double buffering: prefetch chunk c+1 while differentiating chunk c
        # (bound by the WALK count n_chunks, not n_chunks_full: the fill
        # loop never consumes payload, and a prefetch the loop exit leaves
        # un-waited would leak its semaphore into the next grid step)
        @pl.when(c + 1 < n_chunks)
        def _():
            in_copy(c + 1).start()

        in_copy(c).wait()
        d_chunk, t_in, s_pref = grads_of_chunk(c, t_in, s_pref)
        emit(c, d_chunk)
        return c + 1, t_in, s_pref

    def cond(carry):
        c, t_in, _ = carry
        # same stop rule as the forward: once every pixel is saturated no
        # later entry was included, so all remaining gradients are zero
        return (c < n_chunks) & (jnp.max(t_in) >= T_EPS)

    init = (jnp.int32(0), jnp.ones((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32))
    c_stop, _, _ = jax.lax.while_loop(cond, body, init)

    # Drain the input prefetch a saturation early-exit left in flight —
    # without this the stale semaphore signal corrupts the next grid
    # step's first chunk read.
    @pl.when((c_stop < n_chunks) & (c_stop > 0))
    def _():
        in_copy(c_stop).wait()

    # zero-fill every chunk of this tile's span the walk did not write:
    # early-exit-skipped chunks AND chunks beyond the max_per_tile cap
    # (entries there were never included, so their gradients are exactly
    # zero; the shared head chunk still accumulates the neighbor's grads).
    def fill(c, _):
        emit(c, jnp.zeros((PAYLOAD_W, CHUNK), jnp.float32))
        return 0

    jax.lax.fori_loop(c_stop, n_chunks_full, fill, 0)

    n_emitted = jnp.maximum(n_chunks_full, c_stop)
    @pl.when(n_emitted >= 2)
    def _():
        out_copy(n_emitted - 2).wait()

    @pl.when(n_emitted >= 1)
    def _():
        out_copy(n_emitted - 1).wait()


# --------------------------------------------------------------------------
# host-side assembly
# --------------------------------------------------------------------------


def _build_payload(means2d, conics, colors, opacities, gauss_ids):
    """(cap/CHUNK, 16, CHUNK) compact chunked payload.

    ONE row gather of ``capacity`` indices from a pre-packed (N, 16) table
    — gathers are per-index-bound on TPU (~10-13 ns/idx), so packing the
    row first makes its width free and the index count minimal.
    """
    n = means2d.shape[0]
    cap = gauss_ids.shape[0]
    # a zero SENTINEL row at index n absorbs invalid ids (min() instead of
    # clip+where: the masked select was a separate 3ms pass over the 64MB
    # gather output at garden scale — traced round 3)
    table = jnp.concatenate(
        [
            means2d, conics, colors, opacities[:, None],
            jnp.zeros((n, PAYLOAD_W - 9), jnp.float32),
        ],
        axis=-1,
    )                                                     # (N, 16)
    table = jnp.concatenate(
        [table, jnp.zeros((1, PAYLOAD_W), jnp.float32)], axis=0)
    # barriers pin the gather's operand/result to their canonical layouts:
    # inside the full train step XLA otherwise fuses upstream transposes
    # into the gather, turning it strided (measured 10.8ms vs 3.9ms for the
    # same indices at garden scale)
    table, ids = jax.lax.optimization_barrier(
        (table, jnp.minimum(gauss_ids, n)))
    rows = jax.lax.optimization_barrier(table[ids])       # (cap, 16)
    return rows.reshape(cap // CHUNK, CHUNK, PAYLOAD_W).transpose(0, 2, 1)


def _fwd_impl(gathered, gauss_ids, tile_lo, tile_hi, slot_px0, slot_py0,
              tile_w, tile_h, max_per_tile, interpret):
    payload = _build_payload(
        gathered["means2d"], gathered["conics"], gathered["colors"],
        gathered["opacities"], gauss_ids)
    t_slots = slot_px0.shape[0]
    p = tile_w * tile_h

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t_slots,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, p, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, PAYLOAD_W, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tile_w=tile_w, tile_h=tile_h, max_per_tile=max_per_tile)
    colors4, t_fin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_slots, p, 4), jnp.float32),
            jax.ShapeDtypeStruct((t_slots, p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(tile_lo, tile_hi, slot_px0, slot_py0, payload)
    t_fin = t_fin[:, :, 0]
    colors_pix = colors4[:, :, :3]               # (T, P, 3)
    out = (colors_pix, t_fin)
    # residual keeps colors4 (the raw kernel output): the bwd kernel reads
    # c_total from it directly, so no (T,P,3) slice copy is materialized
    return out, (payload, colors4, t_fin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _rasterize_core(
    gathered, gauss_ids, tile_lo, tile_hi, slot_px0, slot_py0,
    tile_w, tile_h, max_per_tile, interpret, num_gaussians, seg_blocks,
):
    out, _ = _fwd_impl(gathered, gauss_ids, tile_lo, tile_hi, slot_px0,
                       slot_py0, tile_w, tile_h, max_per_tile, interpret)
    return out


def _core_fwd(gathered, gauss_ids, tile_lo, tile_hi, slot_px0, slot_py0,
              tile_w, tile_h, max_per_tile, interpret, num_gaussians,
              seg_blocks):
    out, (payload, colors4, t_fin) = _fwd_impl(
        gathered, gauss_ids, tile_lo, tile_hi, slot_px0, slot_py0,
        tile_w, tile_h, max_per_tile, interpret)
    # store the payload itself: rebuilding it in the backward re-runs the
    # capacity-sized gather, and gathers in a VJP/transpose context get
    # scalarized by XLA (~140ms/step measured); residual memory is the
    # cheaper trade
    return out, (payload, colors4, t_fin, gauss_ids, tile_lo, tile_hi,
                 slot_px0, slot_py0)


def _core_bwd(tile_w, tile_h, max_per_tile, interpret, num_gaussians,
              seg_blocks, res, cotangents):
    payload, colors4, t_fin, gauss_ids, tile_lo, tile_hi, px0, py0 = res
    g_colors, g_t = cotangents              # (T, P, 3), (T, P)
    t_slots = px0.shape[0]
    p = tile_w * tile_h
    gt_tp = (g_t * t_fin)[:, None, :]       # (T, 1, P): minor dim stays P

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t_slots,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 3), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, PAYLOAD_W, CHUNK), jnp.float32),
            pltpu.VMEM((2, PAYLOAD_W, CHUNK), jnp.float32),
            pltpu.VMEM((PAYLOAD_W, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tile_w=tile_w, tile_h=tile_h, max_per_tile=max_per_tile)
    d_payload = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(payload.shape, jnp.float32)],
        interpret=interpret,
    )(tile_lo, tile_hi, px0, py0, payload, colors4, g_colors, gt_tp)[0]

    # Every chunk inside some tile's span was written by the kernel. Rows
    # with undefined values are entry positions outside every span: past
    # the overall end (flat layout) or in a camera block's padding tail
    # (blocked layout, where gauss_ids already carry the sentinel) — both
    # resolve to sentinel segment ids that the scatter drops.
    # Only the first 9 payload rows carry gradients (the kernel zero-fills
    # 9..15): slicing before the segment-sum shrinks the scatter updates
    # and the (N, .) accumulator by 16/9 of HBM traffic.
    d_entries = d_payload.transpose(0, 2, 1).reshape(-1, PAYLOAD_W)[:, :9]
    cap = gauss_ids.shape[0]
    in_span = jnp.arange(cap, dtype=jnp.int32) < tile_hi[-1]
    seg_ids = jnp.where(in_span, gauss_ids, num_gaussians)

    if seg_blocks > 1:
        # XLA's TPU scatter emitter degrades ~10x once the accumulator
        # exceeds ~16MB (measured: (524288,16) f32 186ms vs (262144,16)
        # 18ms for the same entry count). The camera-blocked entry layout
        # (isect_tile_rows_blocked) makes entries of camera c occupy the
        # static range [c*eb, (c+1)*eb) with ids in [c*ib, (c+1)*ib), so
        # the reduction runs as seg_blocks independent small-accumulator
        # scatters — total cost linear in the batch size.
        eb = cap // seg_blocks
        ib = num_gaussians // seg_blocks
        outs = []
        for c in range(seg_blocks):
            g = seg_ids[c * eb:(c + 1) * eb] - c * ib
            sids = jnp.where((g >= 0) & (g < ib), g, ib)
            outs.append(jax.ops.segment_sum(
                d_entries[c * eb:(c + 1) * eb], segment_ids=sids,
                num_segments=ib))
        d_all = jnp.concatenate(outs, axis=0)
    else:
        d_all = jax.ops.segment_sum(d_entries, segment_ids=seg_ids,
                                    num_segments=num_gaussians)
    d_gathered = {
        "means2d": d_all[:, 0:2],
        "conics": d_all[:, 2:5],
        "colors": d_all[:, 5:8],
        "opacities": d_all[:, 8],
    }
    return (d_gathered, None, None, None, None, None)


_rasterize_core.defvjp(_core_fwd, _core_bwd)


def rasterize_slots_pl(
    means2d: Array, conics: Array, colors: Array, opacities: Array,
    gauss_ids: Array, tile_offsets: Array = None,
    slot_px0: Array = None, slot_py0: Array = None,
    tile_w: int = 16, tile_h: int = 16, max_per_tile: int = 1024,
    chunk: int = CHUNK, interpret: bool = False,
    *, tile_lo: Array = None, tile_hi: Array = None, seg_blocks: int = 1,
) -> Tuple[Array, Array]:
    """Pallas-backed tile blending; same contract as rasterize_slots.

    Tile spans come either from ``tile_offsets`` ((T+1,), contiguous flat
    layout) or from explicit ``tile_lo``/``tile_hi`` arrays ((T,) each,
    camera-blocked layout from :func:`isect_tile_rows_blocked` — pass
    ``seg_blocks=n_cams`` there so the backward reduction runs per-camera
    small-accumulator scatters).

    ``chunk`` is accepted for API parity but the kernel always uses
    CHUNK=128 (the TPU lane width). ``gauss_ids`` must be CHUNK-divisible
    in length (the trainer's capacity picker rounds to >= 128 multiples).
    """
    if tile_lo is None:
        toff = tile_offsets.astype(jnp.int32)
        tile_lo, tile_hi = toff[:-1], toff[1:]
    else:
        tile_lo = tile_lo.astype(jnp.int32)
        tile_hi = tile_hi.astype(jnp.int32)
    gathered = {
        "means2d": means2d,
        "conics": conics,
        "colors": colors,
        "opacities": opacities,
    }
    return _rasterize_core(
        gathered, gauss_ids, tile_lo, tile_hi,
        slot_px0.astype(jnp.int32), slot_py0.astype(jnp.int32),
        tile_w, tile_h, max_per_tile, interpret, means2d.shape[0],
        seg_blocks,
    )
