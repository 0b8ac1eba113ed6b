"""Model-layer tests: params pytree, Adam parity vs torch, densification surgery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grendel_tpu.models import (
    GaussianParams,
    activated,
    init_from_pcd,
    adam_init,
    adam_step,
    expon_lr,
    scaled_lrs,
    densify_stats_init,
    accumulate_densify_stats,
    densify_and_prune,
    reset_opacity,
    count_alive,
    pad_to_capacity,
)
from grendel_tpu.models.optimizer import LrConfig
from grendel_tpu.models.densify import DensifyStats
from grendel_tpu.ops.knn import mean_dist2_to_knn, _brute_force_knn


# ---------------------------------------------------------------- knn

def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    fast = mean_dist2_to_knn(pts, k=3)
    slow = _brute_force_knn(pts, k=3)
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-6)


def test_knn_tiny_inputs():
    assert mean_dist2_to_knn(np.zeros((1, 3))).shape == (1,)
    out = mean_dist2_to_knn(np.array([[0, 0, 0], [1, 0, 0]], np.float32), k=3)
    np.testing.assert_allclose(out, [1.0, 1.0], rtol=1e-5)


# ---------------------------------------------------------------- init

def test_init_from_pcd():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, capacity=128, max_sh_degree=3)
    assert int(count_alive(alive)) == 100
    act = activated(params)
    np.testing.assert_allclose(np.asarray(act.means3d[:100]), pts, rtol=1e-6)
    # opacity init = 0.1
    np.testing.assert_allclose(np.asarray(act.opacities[:100]), 0.1, rtol=1e-5)
    # dead slots effectively invisible
    assert np.all(np.asarray(act.opacities[100:]) < 1e-4)
    # scales: isotropic sqrt(mean dist2 to 3nn)
    d2 = np.maximum(mean_dist2_to_knn(pts, 3), 1e-7)
    np.testing.assert_allclose(
        np.asarray(act.scales[:100, 0]), np.sqrt(d2), rtol=1e-4
    )
    # DC color roundtrip
    from grendel_tpu.ops.sh import sh_to_rgb_dc
    np.testing.assert_allclose(
        np.asarray(sh_to_rgb_dc(params.sh_dc[:100, 0, :])), cols, rtol=1e-5
    )


def test_pad_to_capacity():
    pts = np.zeros((10, 3), np.float32)
    cols = np.full((10, 3), 0.5, np.float32)
    params, alive = init_from_pcd(pts, cols, capacity=16)
    p2, a2 = pad_to_capacity(params, alive, 32)
    assert a2.shape == (32,)
    assert int(count_alive(a2)) == 10
    assert p2.means3d.shape == (32, 3)
    # grown quats stay unit-norm-able (w=1)
    assert np.all(np.asarray(p2.quats[16:, 0]) == 1.0)


# ---------------------------------------------------------------- lr schedule

def test_expon_lr_matches_reference_formula():
    # reference helper: utils/general_utils.py:364-397
    def ref(step, lr_init, lr_final, lr_delay_steps, lr_delay_mult, max_steps):
        if step < 0:
            return 0.0
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay = 1.0
        t = np.clip(step / max_steps, 0, 1)
        return delay * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)

    args = dict(lr_init=1.6e-4, lr_final=1.6e-6, lr_delay_steps=100,
                lr_delay_mult=0.01, max_steps=30000)
    for step in [-5, 0, 1, 50, 100, 5000, 30000, 50000]:
        got = float(expon_lr(jnp.asarray(step), **args))
        np.testing.assert_allclose(got, ref(step, **args), rtol=1e-5)


def test_scaled_lrs_sqrt_mode():
    cfg, lr_scale = scaled_lrs(
        feature_lr=0.0025, opacity_lr=0.05, scaling_lr=0.005,
        rotation_lr=0.001, bsz=4, lr_scale_mode="sqrt",
    )
    assert lr_scale == pytest.approx(2.0)
    assert cfg.sh_dc == pytest.approx(0.005)
    assert cfg.sh_rest == pytest.approx(0.0025 / 20 * 2)
    assert cfg.eps == pytest.approx(1e-15 / 2)
    assert cfg.beta1 == pytest.approx(0.9 ** 4)
    assert cfg.beta2 == pytest.approx(0.999 ** 4)


# ---------------------------------------------------------------- adam vs torch

def test_adam_matches_torch():
    import torch

    rng = np.random.default_rng(2)
    n = 32
    p0 = rng.normal(size=(n, 3)).astype(np.float32)

    lr = 0.01
    params = GaussianParams(
        means3d=jnp.asarray(p0),
        sh_dc=jnp.zeros((n, 1, 3)),
        sh_rest=jnp.zeros((n, 15, 3)),
        scales_raw=jnp.zeros((n, 3)),
        quats=jnp.zeros((n, 4)),
        opacities_raw=jnp.zeros((n,)),
    )
    state = adam_init(params)
    lrs = LrConfig(sh_dc=0.0, sh_rest=0.0, scales=0.0, quats=0.0, opacity=0.0,
                   beta1=0.9, beta2=0.999, eps=1e-15)
    alive = jnp.ones((n,), bool)

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)

    for step in range(5):
        g = rng.normal(size=(n, 3)).astype(np.float32)
        grads = GaussianParams(
            means3d=jnp.asarray(g),
            sh_dc=jnp.zeros((n, 1, 3)),
            sh_rest=jnp.zeros((n, 15, 3)),
            scales_raw=jnp.zeros((n, 3)),
            quats=jnp.zeros((n, 4)),
            opacities_raw=jnp.zeros((n,)),
        )
        params, state = adam_step(params, grads, state, lrs,
                                  xyz_lr=jnp.asarray(lr), alive=alive)
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()
        np.testing.assert_allclose(
            np.asarray(params.means3d), tp.detach().numpy(), rtol=2e-5, atol=1e-7
        )


def test_adam_respects_alive_mask():
    n = 8
    params = GaussianParams(
        means3d=jnp.ones((n, 3)), sh_dc=jnp.zeros((n, 1, 3)),
        sh_rest=jnp.zeros((n, 15, 3)), scales_raw=jnp.zeros((n, 3)),
        quats=jnp.zeros((n, 4)), opacities_raw=jnp.zeros((n,)),
    )
    grads = jax.tree.map(jnp.ones_like, params)
    state = adam_init(params)
    lrs = LrConfig(0.1, 0.1, 0.1, 0.1, 0.1, 0.9, 0.999, 1e-15)
    alive = jnp.arange(n) < 4
    new, _ = adam_step(params, grads, state, lrs, jnp.asarray(0.1), alive)
    assert not np.allclose(np.asarray(new.means3d[:4]), 1.0)
    np.testing.assert_array_equal(np.asarray(new.means3d[4:]), 1.0)


# ---------------------------------------------------------------- densify

def _simple_params(n, scale=0.01):
    return GaussianParams(
        means3d=jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3),
        sh_dc=jnp.zeros((n, 1, 3)),
        sh_rest=jnp.zeros((n, 15, 3)),
        scales_raw=jnp.full((n, 3), np.log(scale)),
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacities_raw=jnp.full((n,), 2.0),  # sigmoid(2) ~ 0.88
    )


def test_densify_clone_goes_to_free_slot():
    n = 8
    params = _simple_params(n)
    alive = jnp.array([True] * 4 + [False] * 4)
    adam = adam_init(params)
    # make slot 1 moments nonzero to verify the clone's slot is zeroed
    adam = adam._replace(mu=adam.mu._replace(means3d=jnp.ones((n, 3))))
    stats = DensifyStats(
        grad_accum=jnp.array([0, 1, 0, 0, 0, 0, 0, 0], jnp.float32),
        denom=jnp.ones((n,)),
        max_radii=jnp.zeros((n,)),
    )
    p2, a2, adam2, stats2, info = densify_and_prune(
        params, alive, adam, stats, jax.random.key(0),
        grad_threshold=0.5, min_opacity=0.005, extent=10.0,
        percent_dense=0.01, use_size_prune=False,
    )
    assert int(info.n_cloned) == 1 and int(info.n_split) == 0
    assert int(info.n_alive) == 5
    # clone placed at first free slot (4), identical params
    np.testing.assert_allclose(np.asarray(p2.means3d[4]), np.asarray(params.means3d[1]))
    assert bool(a2[4])
    # clone slot has zero Adam moments
    np.testing.assert_array_equal(np.asarray(adam2.mu.means3d[4]), 0.0)
    # parent keeps its moments
    np.testing.assert_array_equal(np.asarray(adam2.mu.means3d[1]), 1.0)
    # stats reset
    assert float(jnp.sum(stats2.grad_accum)) == 0.0


def test_densify_split_makes_two_children_and_kills_parent():
    n = 8
    params = _simple_params(n, scale=1.0)  # big scale -> split
    alive = jnp.array([True] * 3 + [False] * 5)
    adam = adam_init(params)
    adam = adam._replace(nu=adam.nu._replace(scales_raw=jnp.ones((n, 3))))
    stats = DensifyStats(
        grad_accum=jnp.array([0, 0, 1, 0, 0, 0, 0, 0], jnp.float32),
        denom=jnp.ones((n,)),
        max_radii=jnp.zeros((n,)),
    )
    p2, a2, adam2, _, info = densify_and_prune(
        params, alive, adam, stats, jax.random.key(1),
        grad_threshold=0.5, min_opacity=0.005, extent=10.0,
        percent_dense=0.01, use_size_prune=False,
    )
    assert int(info.n_split) == 1 and int(info.n_cloned) == 0
    assert int(info.n_alive) == 4  # 3 - 1 parent + 2 children
    # child1 in parent slot: scale divided by 1.6
    np.testing.assert_allclose(
        np.asarray(jnp.exp(p2.scales_raw[2])), 1.0 / 1.6, rtol=1e-5
    )
    # child2 in first free slot
    assert bool(a2[3])
    np.testing.assert_allclose(
        np.asarray(jnp.exp(p2.scales_raw[3])), 1.0 / 1.6, rtol=1e-5
    )
    # children are near the parent (offset ~ N(0, scale=1))
    assert np.linalg.norm(np.asarray(p2.means3d[2] - params.means3d[2])) < 6.0
    # parent slot moments zeroed (it's now child1)
    np.testing.assert_array_equal(np.asarray(adam2.nu.scales_raw[2]), 0.0)


def test_densify_prune_by_opacity():
    n = 8
    params = _simple_params(n)
    params = params._replace(
        opacities_raw=params.opacities_raw.at[0].set(-10.0)  # ~0 opacity
    )
    alive = jnp.array([True] * 4 + [False] * 4)
    stats = densify_stats_init(n)
    _, a2, _, _, info = densify_and_prune(
        params, alive, adam_init(params), stats, jax.random.key(2),
        grad_threshold=0.5, min_opacity=0.005, extent=10.0,
        percent_dense=0.01, use_size_prune=False,
    )
    assert int(info.n_pruned) == 1
    assert not bool(a2[0])
    assert int(info.n_alive) == 3


def test_densify_size_prune():
    n = 8
    params = _simple_params(n, scale=5.0)  # > 0.1 * extent = 1.0
    alive = jnp.array([True] * 4 + [False] * 4)
    _, a2, _, _, info = densify_and_prune(
        params, alive, adam_init(params), densify_stats_init(n),
        jax.random.key(3),
        grad_threshold=0.5, min_opacity=0.005, extent=10.0,
        percent_dense=0.01, use_size_prune=True,
    )
    assert int(info.n_alive) == 0


def test_densify_overflow_drops_and_reports():
    n = 4
    params = _simple_params(n)
    alive = jnp.ones((n,), bool)
    stats = DensifyStats(
        grad_accum=jnp.ones((n,)), denom=jnp.ones((n,)),
        max_radii=jnp.zeros((n,)),
    )
    _, a2, _, _, info = densify_and_prune(
        params, alive, adam_init(params), stats, jax.random.key(4),
        grad_threshold=0.5, min_opacity=0.005, extent=10.0,
        percent_dense=0.01, use_size_prune=False,
    )
    # all 4 want to clone but zero slots free
    assert int(info.n_dropped) == 4
    assert int(info.n_alive) == 4


def test_accumulate_densify_stats():
    stats = densify_stats_init(4)
    g = jnp.array([[[3.0, 4.0], [0, 0], [1, 0], [0, 0]],
                   [[3.0, 4.0], [0, 1], [0, 0], [0, 0]]])  # (B=2, N=4, 2)
    radii = jnp.array([[2, 0, 1, 0], [3, 1, 0, 0]], jnp.int32)
    # img_w=img_h=2 makes the reference NDC half-size scale (0.5*w, 0.5*h)
    # the identity so the hand-computed norms below hold
    s2 = accumulate_densify_stats(stats, g, radii, img_w=2, img_h=2)
    np.testing.assert_allclose(np.asarray(s2.grad_accum), [10.0, 1.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(s2.denom), [2, 1, 1, 0])
    np.testing.assert_allclose(np.asarray(s2.max_radii), [3, 1, 1, 0])


def test_accumulate_densify_stats_ndc_scale():
    # Reference convention (gaussian_model.py:1054-1064): pixel grads are
    # scaled by (0.5*w, 0.5*h) before the norm, so thresholds like 0.0002
    # are resolution-portable.
    stats = densify_stats_init(1)
    g = jnp.array([[[2e-3, 0.0]]])           # (B=1, N=1, 2) pixel-space grad
    radii = jnp.array([[5]], jnp.int32)
    s2 = accumulate_densify_stats(stats, g, radii, img_w=1000, img_h=800)
    np.testing.assert_allclose(np.asarray(s2.grad_accum), [1.0], rtol=1e-6)


def test_reset_opacity():
    n = 4
    params = _simple_params(n)
    adam = adam_init(params)
    adam = adam._replace(mu=adam.mu._replace(opacities_raw=jnp.ones((n,))))
    p2, adam2 = reset_opacity(params, adam)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(p2.opacities_raw)), 0.01, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(adam2.mu.opacities_raw), 0.0)
    # other moments untouched
    np.testing.assert_array_equal(
        np.asarray(adam2.mu.means3d), np.asarray(adam.mu.means3d)
    )
