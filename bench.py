"""Benchmark: steady-state training throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: full single-chip training steps (render + loss + backward + Adam)
on a synthetic scene shaped like Mip360 garden at images_4 resolution
(1297x840, ~200k live Gaussians). Baseline: the reference trains garden
30k iters in 30.15 min on one A100 (BASELINE.md) = 16.58 it/s; vs_baseline
is our it/s over that. A synthetic scene keeps the benchmark hermetic
(no dataset download) while matching the real per-iteration tensor shapes.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # defaults are the measured round-4 optimum (ROUND4_NOTES sweep table):
    # bsz=2 + 32x16 tiles = 14.3-14.5 img/s vs 11.9 for bsz=1 16x16 —
    # 512-px tiles cut duplicated isect entries 703k -> 485k per camera
    # (the per-index gather/segment-sum floor scales with entry count),
    # and bsz=2 amortizes the per-step fixed stages; bsz>=4 gains nothing
    # more and bsz=8 regresses (bigger working set), so 2 is the knee.
    ap.add_argument("--bsz", type=int, default=None,
                    help="default: 2 (the measured optimum), or 1 under "
                         "--config historical")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--tile", type=str, default=None,
                    help="WxH tile geometry (the reference hardwires 16x16;"
                         " here it is a measured tunable). default: 32x16, "
                         "or 16x16 under --config historical")
    # "historical" re-measures the round-2/3 configuration (bsz=1, 16x16
    # tiles) whose unsuffixed metric key the longitudinal series tracks;
    # the default stays the measured optimum. Run both for a full record:
    #   python bench.py && python bench.py --config historical
    ap.add_argument("--config", choices=["optimum", "historical"],
                    default="optimum")
    ap.add_argument("--no_compaction", action="store_true",
                    help="disable the post-cull blend-budget compaction "
                         "(A/B lever)")
    a = ap.parse_args()
    # the preset only fills flags the user left unset (an explicit
    # --bsz/--tile wins, so the emitted metric key stays truthful)
    preset = ((1, "16x16") if a.config == "historical" else (2, "32x16"))
    a.bsz = preset[0] if a.bsz is None else a.bsz
    a.tile = preset[1] if a.tile is None else a.tile
    tile_w, tile_h = (int(x) for x in a.tile.split("x"))
    import jax
    import jax.numpy as jnp
    from grendel_tpu.cameras import batch_camera_arrays
    from grendel_tpu.engine.render import RenderConfig
    from grendel_tpu.engine.train import (
        XyzLrSchedule, train_state_init, train_step,
    )
    from grendel_tpu.models import scaled_lrs
    from grendel_tpu.models.gaussian_model import GaussianParams
    from grendel_tpu.testing import make_test_camera, random_gaussians
    from grendel_tpu.utils.math3d import inverse_sigmoid

    h, w = 840, 1296          # garden images_4 scale (tile-aligned width)
    n_live = 200_000
    capacity = 262_144
    sh_degree = 3
    bsz = a.bsz
    steps_measured = a.steps

    # Run-unique seed, on purpose: the axon transport records complete
    # runs and REPLAYS them (readbacks included) when a later run issues
    # byte-identical programs+inputs — a replayed benchmark measures the
    # cache, not the chip (observed round 2: a repeated profile reported
    # 0.17ms for a 121ms step). Unique inputs force real execution.
    seed = int.from_bytes(os.urandom(4), "little")
    print(f"# bench seed {seed}", file=sys.stderr)
    key = jax.random.key(seed)
    means, scales, quats, opac, sh = random_gaussians(
        key, n_live, extent=3.0, sh_degree=sh_degree,
        scale_range=(-5.5, -3.5),
    )
    pad = capacity - n_live

    def padn(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    params = GaussianParams(
        means3d=padn(means),
        sh_dc=padn(sh[:, :1, :]),
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

    # steady-state entry-buffer capacity, sized exactly the way the
    # trainer's telemetry auto-tuner converges: 1.15x headroom over the
    # measured true intersection count, rounded up to a 1/8-pow2 mantissa
    # step (engine/trainer.py:_isect_cap_target) — every per-index hot-path
    # op scales with capacity, so benchmarking an oversized pow2 buffer
    # would misstate the tuned steady state
    from grendel_tpu.cameras import camera_arrays
    from grendel_tpu.ops.isect import isect_tiles
    from grendel_tpu.ops.projection import project_gaussians
    ca0 = camera_arrays(cams_host[0])
    # NB: the axon TPU transport speculates results (cassette/replay layer):
    # until the process performs its first device->host readback, dispatches
    # can complete in ~50us WITHOUT real device execution. The int(...)
    # readback below therefore doubles as the "honest mode" flip — every
    # timing taken after it measures real execution. Never time anything
    # before the first readback (see DESIGN.md "speculated dispatch").
    probe = jax.jit(lambda p, al, ca: isect_tiles(
        *(lambda s: (s.means2d, s.radii, s.depths))(project_gaussians(
            p.means3d, jnp.exp(p.scales_raw), p.quats,
            jax.nn.sigmoid(p.opacities_raw),
            jnp.concatenate([p.sh_dc, p.sh_rest], axis=1), al,
            ca.viewmat, ca.full_proj, ca.campos, ca.tanfov,
            h, w, sh_degree)),
        tile_w, tile_h, -(-w // tile_w), -(-h // tile_h), 1 << 23,
        opacities=jax.nn.sigmoid(p.opacities_raw)))
    probe_isect = probe(params, alive, ca0)
    n_isect = int(probe_isect.num_isects)
    n_kept = int(probe_isect.num_kept)

    from grendel_tpu.utils.hbm import mantissa_round_cap

    def cap_of(demand):
        # the trainer tuner's sizing rule (1.15x headroom + shared
        # mantissa rounding) so the bench runs production buffer sizes
        return mantissa_round_cap(1.15 * demand)

    isect_cap = cap_of(n_isect)
    # post-cull blend budget, sized like the trainer's kept-telemetry tuner:
    # the corner cull's drops otherwise ride the per-index payload gather +
    # gradient segment-sum at full expansion capacity
    blend_cap = isect_cap if a.no_compaction else min(cap_of(n_kept),
                                                      isect_cap)
    print(f"# tile {tile_w}x{tile_h}: {n_isect} isects/cam "
          f"({n_kept} post-cull), capacity {isect_cap}/cam, "
          f"blend {blend_cap}/cam", file=sys.stderr)

    # per-tile depth cutoff scales with tile area so every geometry gets
    # the same per-PIXEL blend budget (1024 entries per 256-px tile)
    mpt = 1024 * (tile_w * tile_h) // 256
    cfg = RenderConfig(img_h=h, img_w=w, tile_w=tile_w, tile_h=tile_h,
                       isect_capacity=isect_cap, blend_capacity=blend_cap,
                       max_per_tile=mpt, chunk=64, backend=backend)
    rng = np.random.default_rng(seed)
    gt_u8 = jnp.asarray(
        rng.integers(0, 255, (bsz, 3, h, w), dtype=np.uint8))
    bg = jnp.zeros(3)

    lrs, s = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=bsz)
    sched = XyzLrSchedule(1.6e-4 * s, 1.6e-6 * s, 0.01, 30000)
    state = train_state_init(params, alive)

    def one(state):
        return train_step(state, cams, gt_u8, bg, cfg, sh_degree, bsz,
                          lambda_dssim=0.2, lrs=lrs, xyz_sched=sched)

    # warmup / compile
    state, m = one(state)
    jax.block_until_ready(m["loss"])
    state, m = one(state)
    jax.block_until_ready(m["loss"])

    # The transport's speculation layer has been observed (round 3) to
    # serve fictional sub-ms "steps" even after the honest-mode readback
    # flip above. A full step at this scale cannot beat ~5ms (the blend
    # kernels alone are >25ms of VPU work), so anything faster is replay
    # fiction — retry with fresh readbacks rather than report it.
    for attempt in range(3):
        t0 = time.perf_counter()
        for _ in range(steps_measured):
            state, m = one(state)
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        if dt / steps_measured > 5e-3:
            break
        print(f"# suspect replay fiction ({dt / steps_measured * 1e3:.2f} "
              f"ms/step); re-flipping honest mode (attempt {attempt + 1})",
              file=sys.stderr)
        _ = float(jax.device_get(m["loss"]))   # force a fresh readback
        time.sleep(5.0)

    # per-image throughput: one step consumes bsz images (the reference
    # counts bsz iterations per optimizer step in its bsz>1 configs)
    it_per_s = steps_measured * bsz / dt
    baseline_it_per_s = 30000 / (30.15 * 60)   # garden, 1xA100 (BASELINE.md)
    suffix = "" if bsz == 1 else f"_bsz{bsz}"
    if (tile_w, tile_h) != (16, 16):
        suffix += f"_tile{tile_w}x{tile_h}"
    # per-image throughput over the reference's bsz=1 garden rate: the
    # reference counts bsz images per optimizer step the same way in its
    # bsz>1 headline configs (train_truck_1k.sh uses bsz=8 over the same
    # 30k-image schedule)
    print(json.dumps({
        "metric": f"train_step_throughput_garden4_200k{suffix}",
        "value": round(it_per_s, 3),
        "unit": "iter/s",
        "vs_baseline": round(it_per_s / baseline_it_per_s, 3),
    }))


if __name__ == "__main__":
    main()
