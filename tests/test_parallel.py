"""Distributed (8 virtual devices) vs single-chip parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from grendel_tpu.cameras import batch_camera_arrays, camera_arrays
from grendel_tpu.engine.render import RenderConfig, render_image
from grendel_tpu.engine.train import XyzLrSchedule, train_state_init
from grendel_tpu.models import scaled_lrs
from grendel_tpu.parallel import (
    DivisionHistory, ParallelConfig, ShardedTrainer, divide_rows, pack_gt_rows,
)
from grendel_tpu.testing import make_test_camera
from tests.test_train_step import _make_params

import pytest


# ------------------------------------------------------------ host planner

def test_divide_rows_balanced():
    h = np.ones(24)
    pos = divide_rows(h, 4, max_rows_per_device=8)
    np.testing.assert_array_equal(pos, [0, 6, 12, 18, 24])


def test_divide_rows_skewed_respects_cap():
    h = np.zeros(16)
    h[:2] = 100.0  # nearly all mass in first 2 rows
    pos = divide_rows(h, 4, max_rows_per_device=8)
    assert pos[0] == 0 and pos[-1] == 16
    spans = np.diff(pos)
    assert np.all(spans >= 0) and np.all(spans <= 8)
    # heavy rows should be split across early devices
    assert pos[1] <= 2


def test_division_history_update():
    hist = DivisionHistory(tiles_y=4, decay=0.0)
    cams = [make_test_camera(32, 32, angle=a) for a in (0.0, 0.3)]
    cams[0].uid, cams[1].uid = 10, 11
    heur = hist.heuristic_for(cams)
    np.testing.assert_array_equal(heur, np.ones(8))  # uniform before updates
    pos = np.array([0, 4, 8], np.int32)
    costs = np.zeros((2, 8))
    costs[0, :4] = [1, 2, 3, 4]
    costs[1, :4] = [5, 6, 7, 8]
    hist.update(cams, pos, costs)
    np.testing.assert_allclose(hist.heuristic_for(cams), [1, 2, 3, 4, 5, 6, 7, 8])


def test_pack_gt_rows():
    cams = [make_test_camera(32, 24, angle=a) for a in (0.0, 0.2)]
    for i, c in enumerate(cams):
        c.gt_image_u8 = np.full((3, 24, 32), 10 * (i + 1), np.uint8)
    # H=24, tile_h=16 -> tiles_y=2 (second row half-padded); 2 cams -> 4 rows
    pos = np.array([0, 2, 4], np.int32)
    out = pack_gt_rows(cams, pos, n_devices=2, max_rows=3, tile_h=16,
                       img_h=24, img_w=32)
    assert out.shape == (2, 3, 3, 16, 32)
    assert np.all(out[0, 0] == 10)            # cam0 row 0 full
    assert np.all(out[0, 1, :, :8] == 10)     # cam0 row 1: 8 valid lines
    assert np.all(out[0, 1, :, 8:] == 0)      # padded below image
    assert np.all(out[1, 0] == 20)            # cam1 row 0
    assert np.all(out[1, 2] == 0)             # unused slot


# ------------------------------------------------------------ device parity

@pytest.fixture(scope="module")
def mesh8(eight_devices):
    return Mesh(np.array(eight_devices), ("d",))


@pytest.fixture(scope="module")
def small_scene():
    h, w = 64, 48
    capacity = 256
    cams_host = [make_test_camera(w, h, angle=a) for a in (0.0, 0.5)]
    params, alive = _make_params(jax.random.key(11), 200, capacity, sh_degree=1)
    return h, w, capacity, cams_host, params, alive


def _trainer(mesh8, h, w, bsz, capacity, sh_degree=1):
    cfg = ParallelConfig(
        n_devices=8, bsz=bsz, img_h=h, img_w=w,
        isect_capacity=4096, max_per_tile=256, chunk=32,
    ).resolved(capacity // 8)
    lrs, s = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=bsz)
    sched = XyzLrSchedule(1.6e-3 * s, 1.6e-5 * s, 0.01, 1000)
    return cfg, ShardedTrainer(
        mesh8, cfg, sh_degree=sh_degree, lambda_dssim=0.2,
        lrs=lrs, xyz_sched=sched,
    )


def test_distributed_render_matches_single_chip(mesh8, small_scene):
    h, w, capacity, cams_host, params, alive = small_scene
    bsz = 2
    cfg, trainer = _trainer(mesh8, h, w, bsz, capacity)

    # single-chip renders
    rcfg = RenderConfig(img_h=h, img_w=w, isect_capacity=4096,
                        max_per_tile=256, chunk=32)
    singles = [
        render_image(params, alive, camera_arrays(c), 1, rcfg,
                     bg=jnp.zeros(3))[0]
        for c in cams_host
    ]

    state = trainer.shard_state(train_state_init(params, alive))
    total_rows = cfg.total_rows
    pos = jnp.asarray(divide_rows(np.ones(total_rows), 8, cfg.n_row_slots))
    imgs = trainer.render(state.params, state.alive,
                          batch_camera_arrays(cams_host), pos, jnp.zeros(3))
    assert imgs.shape == (bsz, 3, h, w)
    for b in range(bsz):
        np.testing.assert_allclose(
            np.asarray(imgs[b]), np.asarray(singles[b]), atol=2e-5,
            err_msg=f"camera {b}",
        )


def test_distributed_render_uneven_division(mesh8, small_scene):
    """A skewed division must produce the same image (ownership ≠ content)."""
    h, w, capacity, cams_host, params, alive = small_scene
    bsz = 2
    cfg, trainer = _trainer(mesh8, h, w, bsz, capacity)
    total_rows = cfg.total_rows
    heur = np.ones(total_rows)
    heur[: total_rows // 2] = 5.0   # skew
    pos = jnp.asarray(divide_rows(heur, 8, cfg.n_row_slots))
    pos_uniform = jnp.asarray(divide_rows(np.ones(total_rows), 8, cfg.n_row_slots))

    state = trainer.shard_state(train_state_init(params, alive))
    cams = batch_camera_arrays(cams_host)
    img_a = trainer.render(state.params, state.alive, cams, pos, jnp.zeros(3))
    img_b = trainer.render(state.params, state.alive, cams, pos_uniform,
                           jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), atol=2e-5)


def test_distributed_train_step_losses_and_descent(mesh8, small_scene):
    h, w, capacity, cams_host, params, alive = small_scene
    bsz = 2
    cfg, trainer = _trainer(mesh8, h, w, bsz, capacity)
    cams = batch_camera_arrays(cams_host)
    bg = jnp.zeros(3)

    # GT: render the true scene, then perturb params
    rcfg = RenderConfig(img_h=h, img_w=w, isect_capacity=4096,
                        max_per_tile=256, chunk=32)
    gt_imgs = [
        np.asarray(render_image(params, alive, camera_arrays(c), 1, rcfg,
                                bg=bg)[0])
        for c in cams_host
    ]
    gt_u8 = [(np.clip(g, 0, 1) * 255).astype(np.uint8) for g in gt_imgs]
    for c, g in zip(cams_host, gt_u8):
        c.gt_image_u8 = g

    params0 = params._replace(
        means3d=params.means3d + 0.03 * jax.random.normal(
            jax.random.key(5), params.means3d.shape)
    )
    state = trainer.shard_state(train_state_init(params0, alive))

    pos_np = divide_rows(np.ones(cfg.total_rows), 8, cfg.n_row_slots)
    pos = jnp.asarray(pos_np)
    gt_rows = jnp.asarray(pack_gt_rows(
        cams_host, pos_np, 8, cfg.n_row_slots, cfg.tile_h, h, w))

    # compare the distributed L1 against the single-chip L1 on step 1
    from grendel_tpu.engine.loss import batch_loss
    imgs0 = trainer.render(state.params, state.alive, cams, pos, bg)
    gt_f = jnp.asarray(np.stack(gt_u8)).astype(jnp.float32) / 255.0
    _, percam = batch_loss(imgs0, gt_f, 0.2)
    expected_l1 = float(jnp.sum(percam[:, 0]))

    losses = []
    for i in range(8):
        state, metrics = trainer.step(state, cams, gt_rows, pos, bg)
        losses.append(float(metrics["loss"]))
        if i == 0:
            np.testing.assert_allclose(float(metrics["l1"]), expected_l1,
                                       rtol=1e-4)
            assert int(np.asarray(metrics["a2a_overflow"]).sum()) == 0
            # demand telemetry: some device received entries, none claims
            # more than its bucket holds (overflow was 0)
            demand = np.asarray(metrics["a2a_demand"])
            assert demand.max() > 0
            assert demand.max() <= cfg.send_cap
            # the packed telemetry carries all four segments
            tel = np.asarray(metrics["telemetry"])
            assert tel.shape == (32,)   # 4 segments x 8 devices
            assert tel[16:24].max() == demand.max()
            # post-cull kept count: positive, never above the pre-cull
            # demand (holds per device, hence for the maxima)
            kept = np.asarray(metrics["num_kept"])
            assert kept.max() > 0
            assert kept.max() <= np.asarray(metrics["num_isects"]).max()
            assert tel[24:].max() == kept.max()
    assert losses[-1] < losses[0], losses
    # iteration advanced
    assert int(jax.device_get(state.iteration)) == 8 * bsz
    # per-row cost telemetry has sane shape and mass
    pre = np.asarray(metrics["per_row_entries"])
    assert pre.shape == (8, cfg.n_row_slots)
    assert pre.sum() > 0


def test_distributed_densify_and_opacity_reset(mesh8, small_scene):
    h, w, capacity, cams_host, params, alive = small_scene
    cfg, trainer = _trainer(mesh8, h, w, 2, capacity)
    state = trainer.shard_state(train_state_init(params, alive))
    # force stats so some gaussians clone
    stats = state.stats._replace(
        grad_accum=jnp.ones_like(state.stats.grad_accum),
        denom=jnp.ones_like(state.stats.denom),
    )
    state = state._replace(stats=stats)
    n_alive_before = int(jnp.sum(state.alive))
    state2, info = trainer.densify(
        state, jax.random.key(0), grad_threshold=0.5, min_opacity=0.005,
        extent=10.0, percent_dense=0.01, use_size_prune=False,
    )
    assert info.shape == (8, 5)
    n_alive_after = int(jnp.sum(state2.alive))
    assert n_alive_after >= n_alive_before
    assert n_alive_after == info[:, 4].sum()

    state3 = trainer.reset_opacity(state2)
    opac = jax.nn.sigmoid(np.asarray(state3.params.opacities_raw))
    alive_np = np.asarray(state3.alive)
    assert np.all(opac[alive_np] <= 0.011)


def test_distributed_ssim_exact_on_camera_aligned_division(mesh8, small_scene):
    """With division boundaries on camera edges, span borders coincide with
    image borders, so the distributed (gapped tall-image) SSIM must equal
    the full-image SSIM exactly."""
    h, w, capacity, cams_host, params, alive = small_scene
    bsz = 2
    # row buffer large enough for one whole camera per device
    pcfg = ParallelConfig(
        n_devices=8, bsz=bsz, img_h=h, img_w=w,
        isect_capacity=4096, max_per_tile=256, chunk=32,
        n_row_slots=-(-h // 16),
    ).resolved(capacity // 8)
    lrs, s = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=bsz)
    sched = XyzLrSchedule(1.6e-3 * s, 1.6e-5 * s, 0.01, 1000)
    cfg, trainer = pcfg, ShardedTrainer(
        mesh8, pcfg, sh_degree=1, lambda_dssim=0.2, lrs=lrs, xyz_sched=sched)
    cams = batch_camera_arrays(cams_host)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(7)
    gt_u8 = [rng.integers(0, 255, (3, h, w), np.uint8) for _ in cams_host]
    for c, g in zip(cams_host, gt_u8):
        c.gt_image_u8 = g

    tiles_y = cfg.tiles_y
    # device 0 -> camera 0, device 1 -> camera 1, rest empty
    pos_np = np.array([0, tiles_y, 2 * tiles_y] + [2 * tiles_y] * 6, np.int32)
    gt_rows = jax.device_put(
        pack_gt_rows(cams_host, pos_np, 8, cfg.n_row_slots, cfg.tile_h, h, w),
        trainer.sharding_for(P("d")))
    state = trainer.shard_state(train_state_init(params, alive))
    _, metrics = trainer.step(state, cams, gt_rows, jnp.asarray(pos_np), bg)

    from grendel_tpu.engine.loss import batch_loss
    imgs = trainer.render(state.params, state.alive, cams,
                          jnp.asarray(pos_np), bg)
    gt_f = jnp.asarray(np.stack(gt_u8)).astype(jnp.float32) / 255.0
    _, percam = batch_loss(imgs, gt_f, 0.2)
    np.testing.assert_allclose(
        float(metrics["ssim"]), float(jnp.sum(percam[:, 1])), rtol=2e-4)
    np.testing.assert_allclose(
        float(metrics["l1"]), float(jnp.sum(percam[:, 0])), rtol=2e-4)


def test_divide_rows_border_snap():
    """Division points within border_coeff rows of an image boundary snap
    to the boundary (ref --border_divpos_coeff,
    workload_division.py:889-906)."""
    from grendel_tpu.parallel import divide_rows

    # 2 images x 10 rows, mass arranged so the midpoint falls 1 row past
    # the first image boundary
    h = np.ones(20)
    h[:11] = 0.9
    pos = divide_rows(h, 2, 20)
    assert pos[1] == 11                 # no snapping without the coeff
    pos = divide_rows(h, 2, 20, rows_per_image=10, border_coeff=1.0)
    assert pos[1] == 10, pos            # snapped down to the boundary
    # and the near-upper-boundary case snaps up
    h2 = np.ones(20)
    h2[:9] = 1.3
    pos = divide_rows(h2, 2, 20)
    assert pos[1] == 9
    pos = divide_rows(h2, 2, 20, rows_per_image=10, border_coeff=1.0)
    assert pos[1] == 10, pos
    # interior points untouched
    h3 = np.ones(20)
    pos = divide_rows(h3, 4, 20, rows_per_image=10, border_coeff=1.0)
    assert list(pos) == [0, 5, 10, 15, 20]


def test_random_background_on_device(mesh8, small_scene):
    """--random_background draws the bg INSIDE the jitted step from the
    replicated iteration counter (one jax.random draw per step, shared by
    the batch): it varies per step and is deterministic in the iteration,
    with no per-step host array (ref train_internal.py draws one
    torch.rand(3) per iteration under identical per-rank seeding)."""
    h, w, capacity, cams_host, params, alive = small_scene
    bsz = 2
    cfg = ParallelConfig(
        n_devices=8, bsz=bsz, img_h=h, img_w=w,
        isect_capacity=4096, max_per_tile=256, chunk=32,
        random_background=True, bg_seed=7,
    ).resolved(capacity // 8)
    lrs, s = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=bsz)
    sched = XyzLrSchedule(1.6e-3 * s, 1.6e-5 * s, 0.01, 1000)
    trainer = ShardedTrainer(mesh8, cfg, sh_degree=1, lambda_dssim=0.2,
                             lrs=lrs, xyz_sched=sched)

    # zero alive gaussians + zero GT: the rendered rows are exactly the
    # background, so the per-step L1 is a pure readout of the step's bg
    state = trainer.shard_state(
        train_state_init(params, jnp.zeros_like(alive)))
    pos = jnp.asarray(divide_rows(np.ones(cfg.total_rows), 8,
                                  cfg.n_row_slots))
    gt_rows = jnp.zeros((8, cfg.n_row_slots, 3, cfg.tile_h, w), jnp.uint8)
    cams = batch_camera_arrays(cams_host)
    bg_host = jnp.zeros(3)                   # ignored under the flag
    state, m1 = trainer.step(state, cams, gt_rows, pos, bg_host)
    state, m2 = trainer.step(state, cams, gt_rows, pos, bg_host)
    l1a, l1b = float(m1["l1"]), float(m2["l1"])
    assert l1a > 1e-3 and l1b > 1e-3         # bg is not the passed zeros
    assert abs(l1a - l1b) > 1e-6             # varies across steps

    # deterministic in (seed, iteration): a fresh run repeats step 1
    state0 = trainer.shard_state(
        train_state_init(params, jnp.zeros_like(alive)))
    _, m1r = trainer.step(state0, cams, gt_rows, pos, bg_host)
    np.testing.assert_allclose(float(m1r["l1"]), l1a, rtol=1e-6)

    # flag off: the passed bg is used verbatim -> zero L1 on this setup
    cfg_off = cfg._replace(random_background=False)
    t_off = ShardedTrainer(mesh8, cfg_off, sh_degree=1, lambda_dssim=0.2,
                           lrs=lrs, xyz_sched=sched)
    s_off = t_off.shard_state(
        train_state_init(params, jnp.zeros_like(alive)))
    _, m_off = t_off.step(s_off, cams, gt_rows, pos, bg_host)
    np.testing.assert_allclose(float(m_off["l1"]), 0.0, atol=1e-7)
