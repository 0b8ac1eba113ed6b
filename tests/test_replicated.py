"""Replicated-Gaussian (legacy DP) mode vs sharded mode parity."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import pytest

from grendel_tpu.cameras import batch_camera_arrays, camera_arrays
from grendel_tpu.engine.render import RenderConfig, render_image
from grendel_tpu.engine.train import XyzLrSchedule, train_state_init
from grendel_tpu.models import scaled_lrs
from grendel_tpu.parallel import (
    ParallelConfig, ShardedTrainer, divide_rows, pack_gt_rows,
)
from grendel_tpu.testing import make_test_camera
from tests.test_train_step import _make_params


@pytest.fixture(scope="module")
def mesh8(eight_devices):
    return Mesh(np.array(eight_devices), ("d",))


def _trainer(mesh8, h, w, bsz, capacity, replicated):
    cfg = ParallelConfig(
        n_devices=8, bsz=bsz, img_h=h, img_w=w,
        isect_capacity=4096, max_per_tile=256, chunk=32,
        gaussians_distribution=not replicated,
    ).resolved(capacity // 8)
    lrs, s = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=bsz)
    sched = XyzLrSchedule(1.6e-3 * s, 1.6e-5 * s, 0.01, 1000)
    return cfg, ShardedTrainer(mesh8, cfg, sh_degree=1, lambda_dssim=0.2,
                               lrs=lrs, xyz_sched=sched)


def test_replicated_render_matches_single_chip(mesh8):
    h, w, capacity = 64, 48, 256
    cams_host = [make_test_camera(w, h, angle=a) for a in (0.0, 0.5)]
    params, alive = _make_params(jax.random.key(11), 200, capacity, 1)
    cfg, trainer = _trainer(mesh8, h, w, 2, capacity, replicated=True)

    rcfg = RenderConfig(img_h=h, img_w=w, isect_capacity=4096,
                        max_per_tile=256, chunk=32)
    singles = [
        render_image(params, alive, camera_arrays(c), 1, rcfg,
                     bg=jnp.zeros(3))[0]
        for c in cams_host
    ]
    state = trainer.shard_state(train_state_init(params, alive))
    pos = jnp.asarray(divide_rows(np.ones(cfg.total_rows), 8, cfg.n_row_slots))
    imgs = trainer.render(state.params, state.alive,
                          batch_camera_arrays(cams_host), pos, jnp.zeros(3))
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(imgs[b]), np.asarray(singles[b]), atol=2e-5)


def test_replicated_step_matches_sharded_losses(mesh8):
    """Both parallel modes must compute the same loss and descend."""
    h, w, capacity, bsz = 64, 48, 256, 2
    cams_host = [make_test_camera(w, h, angle=a) for a in (0.0, 0.5)]
    params, alive = _make_params(jax.random.key(3), 200, capacity, 1)
    rng = np.random.default_rng(0)
    for c in cams_host:
        c.gt_image_u8 = rng.integers(0, 255, (3, h, w), np.uint8)
    cams = batch_camera_arrays(cams_host)
    bg = jnp.zeros(3)

    losses = {}
    for name, replicated in (("sharded", False), ("replicated", True)):
        cfg, trainer = _trainer(mesh8, h, w, bsz, capacity, replicated)
        state = trainer.shard_state(train_state_init(params, alive))
        pos_np = divide_rows(np.ones(cfg.total_rows), 8, cfg.n_row_slots)
        gt_rows = jax.device_put(
            pack_gt_rows(cams_host, pos_np, 8, cfg.n_row_slots, cfg.tile_h,
                         h, w),
            trainer.sharding_for(P("d")))
        ls = []
        for _ in range(4):
            state, m = trainer.step(state, cams, gt_rows,
                                    jnp.asarray(pos_np), bg)
            ls.append(float(m["loss"]))
        losses[name] = ls
        # replicated copies must stay in sync across devices: gather the
        # replicated param and ensure finite
        assert np.isfinite(ls[-1])
    np.testing.assert_allclose(losses["sharded"][0], losses["replicated"][0],
                               rtol=2e-4)
    assert losses["replicated"][-1] < losses["replicated"][0]


def test_replicated_densify_stays_in_sync(mesh8):
    h, w, capacity = 48, 48, 256
    params, alive = _make_params(jax.random.key(5), 100, capacity, 1)
    cfg, trainer = _trainer(mesh8, h, w, 1, capacity, replicated=True)
    state = trainer.shard_state(train_state_init(params, alive))
    state = state._replace(stats=state.stats._replace(
        grad_accum=jnp.ones_like(state.stats.grad_accum),
        denom=jnp.ones_like(state.stats.denom)))
    state2, info = trainer.densify(
        state, jax.random.key(0), grad_threshold=0.5, min_opacity=0.005,
        extent=10.0, percent_dense=0.01, use_size_prune=False)
    # all devices report the identical result (replicated => same work)
    assert (info == info[0]).all()
    assert int(info[0, 4]) == int(jnp.sum(state2.alive))
