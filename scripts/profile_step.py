#!/usr/bin/env python
"""Per-stage step-time attribution on the current backend.

The TPU-side analogue of the reference's per-kernel GPU timer tables
(/root/reference/analyze_statistic.py:747-809, which mines the CUDA
extension's "10 preprocess / 70 render / b10 render" stage timers): each
stage of the training step is jitted and timed in isolation, then compared
against the fused full step. Prints a table plus a JSON line for
regression tracking.

Usage:
  python scripts/profile_step.py [--height 840 --width 1296 --n 200000
                                  --bsz 1 --steps 20] [--trace DIR]

A stage-sum larger than the full step is normal (XLA fuses/overlaps across
stage boundaries inside the one compiled step); the interesting signals are
each stage's absolute cost and step-over-sum residual.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, steps=20, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=840)
    ap.add_argument("--width", type=int, default=1296)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--bsz", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--tile", type=str, default="32x16",
                    help="WxH tile geometry (round-4 measured default)")
    ap.add_argument("--trace", type=str, default=None,
                    help="jax.profiler trace output dir")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--no_compaction", action="store_true",
                    help="disable the post-cull blend-budget compaction")
    a = ap.parse_args()

    import jax
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    import jax.numpy as jnp
    from grendel_tpu.cameras import batch_camera_arrays
    from grendel_tpu.engine.render import RenderConfig, render_batch
    from grendel_tpu.engine.train import (
        XyzLrSchedule, train_state_init, train_step,
    )
    from grendel_tpu.engine.loss import batch_loss
    from grendel_tpu.models import scaled_lrs
    from grendel_tpu.models.gaussian_model import GaussianParams, activated
    from grendel_tpu.models.optimizer import adam_step
    from grendel_tpu.ops.projection import project_gaussians
    from grendel_tpu.ops.isect import isect_tiles
    from grendel_tpu.testing import make_test_camera, random_gaussians
    from grendel_tpu.utils.math3d import inverse_sigmoid

    h, w, n_live, bsz, sh_degree = a.height, a.width, a.n, a.bsz, a.sh_degree
    capacity = 1 << int(np.ceil(np.log2(max(n_live, 2) * 1.3)))
    # run-unique seed: the transport replays recorded runs with identical
    # programs+inputs, readbacks included — a replayed profile measures
    # nothing (see bench.py / DESIGN.md "speculated dispatch")
    seed = int.from_bytes(os.urandom(4), "little")
    print(f"# profile seed {seed}")
    key = jax.random.key(seed)
    means, scales, quats, opac, sh = random_gaussians(
        key, n_live, extent=3.0, sh_degree=sh_degree,
        scale_range=(-5.5, -3.5))
    pad = capacity - n_live

    def padn(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    params = GaussianParams(
        means3d=padn(means), sh_dc=padn(sh[:, :1, :]),
        sh_rest=padn(sh[:, 1:, :]),
        scales_raw=padn(jnp.log(scales), fill=-10.0),
        quats=padn(quats).at[n_live:, 0].set(1.0),
        opacities_raw=padn(
            inverse_sigmoid(jnp.clip(opac, 1e-4, 1 - 1e-4)), fill=-10.0),
    )
    alive = jnp.arange(capacity) < n_live
    backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    cams_host = [make_test_camera(w, h, dist=5.0, angle=0.1 * i)
                 for i in range(bsz)]
    cams = batch_camera_arrays(cams_host)

    # tight per-camera entry capacity, matching the trainer auto-tuner's
    # steady state (1.15x headroom, 1/8-pow2 mantissa rounding) — see
    # bench.py; profiling an oversized pow2 buffer misstates every
    # capacity-proportional stage
    # The axon TPU transport speculates results (cassette/replay layer):
    # before the process's first device->host readback, dispatches can
    # return in ~50us WITHOUT real device execution, which makes any
    # timing taken in that window fiction. The int(n_isect) readback
    # below flips the process into honest execution; every stage timing
    # after it is real (see DESIGN.md "speculated dispatch").
    from grendel_tpu.cameras import camera_arrays
    ca0 = camera_arrays(cams_host[0])
    sp0 = jax.jit(lambda p, al, ca: project_gaussians(
        p.means3d, jnp.exp(p.scales_raw), p.quats,
        jax.nn.sigmoid(p.opacities_raw),
        jnp.concatenate([p.sh_dc, p.sh_rest], axis=1), al,
        ca.viewmat, ca.full_proj, ca.campos, ca.tanfov,
        h, w, sh_degree))(params, alive, ca0)
    tile_w, tile_h = (int(x) for x in a.tile.split("x"))
    probe = jax.jit(lambda s: isect_tiles(
        s.means2d, s.radii, s.depths, tile_w, tile_h,
        -(-w // tile_w), -(-h // tile_h),
        1 << 23, opacities=s.opacities))(sp0)
    n_isect, n_kept = int(probe.num_isects), int(probe.num_kept)

    from grendel_tpu.utils.hbm import mantissa_round_cap

    def cap_of(demand):
        # the trainer tuner's sizing rule (see bench.py / Trainer._round_cap)
        return mantissa_round_cap(1.15 * demand)

    isect_cap = cap_of(n_isect)
    blend_cap = isect_cap if a.no_compaction else min(cap_of(n_kept),
                                                      isect_cap)
    print(f"# {n_isect} isects/cam ({n_kept} post-cull), capacity "
          f"{isect_cap}, blend {blend_cap}")
    cfg = RenderConfig(img_h=h, img_w=w, tile_w=tile_w, tile_h=tile_h,
                       isect_capacity=isect_cap, blend_capacity=blend_cap,
                       max_per_tile=1024 * (tile_w * tile_h) // 256,
                       chunk=64, backend=backend)
    rng = np.random.default_rng(seed)
    gt_u8 = jnp.asarray(rng.integers(0, 255, (bsz, 3, h, w), dtype=np.uint8))
    gt = gt_u8.astype(jnp.float32) / 255.0
    bg = jnp.zeros(3)
    lrs, s = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=bsz)
    sched = XyzLrSchedule(1.6e-4 * s, 1.6e-6 * s, 0.01, 30000)
    state = train_state_init(params, alive)

    times = {}

    # ---- full step ----
    def full(state):
        return train_step(state, cams, gt_u8, bg, cfg, sh_degree, bsz,
                          lambda_dssim=0.2, lrs=lrs, xyz_sched=sched)

    times["full_step"] = timeit(lambda s_: full(s_)[1]["loss"], state,
                                steps=a.steps)

    # ---- projection fwd ----
    act = activated(params)

    @jax.jit
    def proj_fwd(act_in, al, cs):
        def one(vm, fp, cp, tf):
            return project_gaussians(
                act_in.means3d, act_in.scales, act_in.quats,
                act_in.opacities, act_in.sh, al, vm, fp, cp, tf,
                h, w, sh_degree)
        return jax.vmap(one)(cs.viewmat, cs.full_proj, cs.campos, cs.tanfov)

    splats_b = proj_fwd(act, alive, cams)
    times["project_fwd"] = timeit(proj_fwd, act, alive, cams, steps=a.steps)

    # ---- isect ----
    splats0 = jax.tree.map(lambda x: x[0], splats_b)

    @jax.jit
    def isect_only(sp):
        return isect_tiles(sp.means2d, sp.radii, sp.depths,
                           cfg.tile_w, cfg.tile_h, cfg.tiles_x, cfg.tiles_y,
                           capacity=cfg.isect_capacity,
                           opacities=sp.opacities)

    isect = isect_only(splats0)
    times["isect"] = timeit(isect_only, splats0, steps=a.steps) * bsz

    # isolated raster stages see the same compacted entry list production
    # sees (engine/render.py applies this inside the fused step)
    ids_r, toff_r = isect.gauss_ids, isect.tile_offsets
    if cfg.blend_cap < cfg.isect_capacity:
        from grendel_tpu.ops.isect import compact_entries_flat

        ids_r, toff_r = jax.jit(
            lambda i, t: compact_entries_flat(i, t, cfg.blend_cap)
        )(ids_r, toff_r)

    # ---- rasterize fwd only ----
    # numpy on purpose: np closures embed as HLO literals; capturing
    # committed device arrays would force an extra readback at lowering
    t_ids = np.arange(cfg.num_tiles, dtype=np.int32)
    px0 = (t_ids % cfg.tiles_x) * cfg.tile_w
    py0 = (t_ids // cfg.tiles_x) * cfg.tile_h

    if backend == "pallas":
        from grendel_tpu.ops.rasterize_pallas import rasterize_slots_pl as rs
    else:
        from grendel_tpu.ops.rasterize_jax import rasterize_slots as rs_j

        def rs(m2, co, cl, op, gid, toff, x0, y0, tw, th, mpt):
            return rs_j(m2, co, cl, op, gid, toff, x0, y0, tw, th, mpt,
                        cfg.chunk)

    @jax.jit
    def raster_fwd(sp, ids, toff):
        return rs(sp.means2d, sp.conics, sp.colors, sp.opacities,
                  ids, toff, px0, py0,
                  cfg.tile_w, cfg.tile_h, cfg.max_per_tile)[0]

    raster_fwd(splats0, ids_r, toff_r)
    times["raster_fwd"] = timeit(raster_fwd, splats0, ids_r, toff_r,
                                 steps=a.steps) * bsz

    # ---- rasterize fwd+bwd ----
    @jax.jit
    def raster_fwd_bwd(sp, ids, toff):
        def f(m2, co, cl, op):
            img, tf = rs(m2, co, cl, op, ids, toff,
                         px0, py0, cfg.tile_w, cfg.tile_h, cfg.max_per_tile)
            return jnp.sum(img) + jnp.sum(tf)
        return jax.grad(f, argnums=(0, 1, 2, 3))(
            sp.means2d, sp.conics, sp.colors, sp.opacities)

    raster_fwd_bwd(splats0, ids_r, toff_r)
    times["raster_fwd_bwd"] = timeit(raster_fwd_bwd, splats0, ids_r, toff_r,
                                     steps=a.steps) * bsz

    # ---- loss (L1+SSIM) fwd+bwd ----
    img_b = jnp.zeros((bsz, 3, h, w), jnp.float32)

    @jax.jit
    def loss_fwd_bwd(imgs, gt_in):
        return jax.grad(lambda x: batch_loss(x, gt_in, 0.2)[0])(imgs)

    loss_fwd_bwd(img_b, gt)
    times["loss_fwd_bwd"] = timeit(loss_fwd_bwd, img_b, gt, steps=a.steps)

    # ---- adam ----
    grads = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def adam_only(p, g, st, al):
        return adam_step(p, g, st, lrs, 1e-4, al)

    adam_only(params, grads, state.adam, alive)
    times["adam"] = timeit(adam_only, params, grads, state.adam, alive,
                           steps=a.steps)

    # ---- end-to-end fwd (render_batch) for reference ----
    @jax.jit
    def fwd_only(p, al, cs, bg_in):
        imgs, _, _ = render_batch(p, al, cs, sh_degree, cfg, bg=bg_in)
        return imgs

    fwd_only(params, alive, cams, bg)
    times["render_batch_fwd"] = timeit(fwd_only, params, alive, cams, bg,
                                       steps=a.steps)

    if a.trace:
        jax.profiler.start_trace(a.trace)
        st2, m = full(state)
        jax.block_until_ready(m["loss"])
        jax.profiler.stop_trace()
        print(f"trace written to {a.trace}")

    known = (times["project_fwd"] + times["isect"] + times["raster_fwd_bwd"]
             + times["loss_fwd_bwd"] + times["adam"])
    print(f"\n== per-stage times (ms), backend={backend}, "
          f"{n_live} live / cap {capacity}, {w}x{h}, bsz={bsz}, "
          f"tile {tile_w}x{tile_h} ==")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v:9.2f}")
    print(f"  {'stage_sum(indep)':24s} {known:9.2f}")
    print(f"  {'residual(step-sum)':24s} {times['full_step'] - known:9.2f}")
    print(json.dumps({"profile": {k: round(v, 2) for k, v in times.items()}}))


if __name__ == "__main__":
    main()
