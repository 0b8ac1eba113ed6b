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


def test_grad_normalization_by_visibility_semantics():
    """normalize_grads_by_visibility applies the named per-Gaussian factor
    along axis 0 of every param leaf (ref --grad_normalization_mode,
    arguments/__init__.py:157)."""
    from grendel_tpu.models.gaussian_model import GaussianParams
    from grendel_tpu.parallel.sharded import normalize_grads_by_visibility

    n = 4
    grads = GaussianParams(
        means3d=jnp.ones((n, 3)),
        sh_dc=jnp.ones((n, 1, 3)),
        sh_rest=jnp.ones((n, 3, 3)),
        scales_raw=jnp.ones((n, 3)),
        quats=jnp.ones((n, 4)),
        opacities_raw=jnp.ones((n,)),
    )
    # visible in 2 / 1 / 0 / 2 of the two views
    radii = jnp.array([[3, 1, 0, 5],
                       [2, 0, 0, 4]], jnp.int32)
    vis = np.array([2.0, 1.0, 0.0, 2.0])

    same = normalize_grads_by_visibility(grads, radii, "none")
    assert same is grads

    div = normalize_grads_by_visibility(grads, radii, "divide_by_visible_count")
    exp = 1.0 / np.maximum(vis, 1.0)
    np.testing.assert_allclose(np.asarray(div.means3d), exp[:, None] *
                               np.ones((n, 3)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(div.sh_rest)[:, 0, 0], exp)
    np.testing.assert_allclose(np.asarray(div.opacities_raw), exp)

    mul = normalize_grads_by_visibility(grads, radii,
                                        "multiply_by_visible_count")
    np.testing.assert_allclose(np.asarray(mul.opacities_raw), vis)
    sq = normalize_grads_by_visibility(
        grads, radii, "square_multiply_by_visible_count")
    np.testing.assert_allclose(np.asarray(sq.opacities_raw), vis * vis)

    with pytest.raises(ValueError):
        normalize_grads_by_visibility(grads, radii, "bogus")


def test_grad_normalization_wired_in_replicated_step(mesh8):
    """The replicated step applies the normalization: loss is identical
    (normalization is post-backward) but the updated params differ from
    mode='none'."""
    h, w, capacity, bsz = 64, 48, 256, 2
    cams_host = [make_test_camera(w, h, angle=a) for a in (0.0, 0.9)]
    params, alive = _make_params(jax.random.key(3), 200, capacity, 1)
    rng = np.random.default_rng(0)
    for c in cams_host:
        c.gt_image_u8 = rng.integers(0, 255, (3, h, w), np.uint8)
    cams = batch_camera_arrays(cams_host)
    bg = jnp.zeros(3)

    from grendel_tpu.engine.train import train_state_init

    def run(mode):
        cfg = ParallelConfig(
            n_devices=8, bsz=bsz, img_h=h, img_w=w,
            isect_capacity=4096, max_per_tile=256, chunk=32,
            gaussians_distribution=False,
        ).resolved(capacity // 8)
        lrs, s = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=bsz)
        sched = XyzLrSchedule(1.6e-3 * s, 1.6e-5 * s, 0.01, 1000)
        tr = ShardedTrainer(mesh8, cfg, sh_degree=1, lambda_dssim=0.2,
                            lrs=lrs, xyz_sched=sched,
                            grad_normalization_mode=mode)
        state = tr.shard_state(train_state_init(params, alive))
        pos = np.asarray(divide_rows(
            np.ones(cfg.total_rows), 8, cfg.n_row_slots))
        gt_rows = pack_gt_rows(cams_host, pos, 8, cfg.n_row_slots, 16, h, w)
        state, m = tr.step(state, cams, jnp.asarray(gt_rows), pos, bg)
        return float(m["loss"]), np.asarray(state.adam.mu.means3d)

    # NB: Adam's FIRST step is per-element scale-invariant (m_hat/sqrt(v_hat)
    # = sign(g) up to eps), so the observable is the first moment, which
    # scales linearly with the normalized gradient.
    loss_none, mu_none = run("none")
    loss_div, mu_div = run("divide_by_visible_count")
    np.testing.assert_allclose(loss_none, loss_div, rtol=1e-6)
    nz = np.abs(mu_none).sum(axis=1) > 1e-12
    assert nz.sum() > 50
    ratio = (np.abs(mu_div).sum(axis=1)[nz]
             / np.abs(mu_none).sum(axis=1)[nz])
    # every contributing Gaussian is visible in 1 or 2 of the two views
    assert set(np.round(ratio, 4).tolist()) <= {0.5, 1.0}
    assert (np.abs(ratio - 0.5) < 1e-4).any()   # some are seen by both
