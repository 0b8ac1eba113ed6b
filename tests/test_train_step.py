"""End-to-end single-chip training: overfit a tiny synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp

from grendel_tpu.cameras import batch_camera_arrays
from grendel_tpu.engine.render import RenderConfig, render_image
from grendel_tpu.engine.train import (
    TrainState, XyzLrSchedule, train_state_init, train_step,
)
from grendel_tpu.models import (
    GaussianParams, adam_init, scaled_lrs, densify_stats_init,
)
from grendel_tpu.models.densify import densify_and_prune
from grendel_tpu.ops.ssim import psnr
from grendel_tpu.testing import make_test_camera, random_gaussians
from grendel_tpu.ops.sh import rgb_to_sh
from grendel_tpu.utils.math3d import inverse_sigmoid


def _make_params(key, n, capacity, sh_degree=1):
    means, scales, quats, opac, sh = random_gaussians(key, n, sh_degree=sh_degree)
    pad = capacity - n

    def padn(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    params = GaussianParams(
        means3d=padn(means),
        sh_dc=padn(sh[:, :1, :]),
        sh_rest=padn(sh[:, 1:, :]),
        scales_raw=padn(jnp.log(scales), fill=-10.0),
        quats=padn(quats).at[n:, 0].set(1.0),
        opacities_raw=padn(inverse_sigmoid(jnp.clip(opac, 1e-4, 1 - 1e-4)),
                           fill=-10.0),
    )
    alive = jnp.arange(capacity) < n
    return params, alive


def test_training_reduces_loss_and_improves_psnr():
    h, w = 48, 64
    sh_degree = 1
    cfg = RenderConfig(img_h=h, img_w=w, isect_capacity=4096, max_per_tile=256,
                       chunk=32)
    cams_host = [make_test_camera(w, h, angle=a) for a in (0.0, 0.4)]
    bsz = 2
    cams = batch_camera_arrays(cams_host)
    bg = jnp.zeros(3)

    # Ground-truth scene rendered from "true" gaussians
    key = jax.random.key(7)
    true_params, true_alive = _make_params(key, 80, 128, sh_degree)
    gts = []
    for c in cams_host:
        from grendel_tpu.cameras import camera_arrays
        img, _ = render_image(true_params, true_alive, camera_arrays(c),
                              sh_degree, cfg, bg=bg)
        gts.append(img)
    gt = jnp.stack(gts)
    gt_u8 = (jnp.clip(gt, 0, 1) * 255).astype(jnp.uint8)

    # Start from perturbed parameters
    k2 = jax.random.key(8)
    params0 = true_params._replace(
        means3d=true_params.means3d + 0.05 * jax.random.normal(
            k2, true_params.means3d.shape),
        sh_dc=true_params.sh_dc + 0.3 * jax.random.normal(
            jax.random.key(9), true_params.sh_dc.shape),
    )
    state = train_state_init(params0, true_alive)

    lrs, lr_scale = scaled_lrs(
        feature_lr=0.0025, opacity_lr=0.05, scaling_lr=0.005,
        rotation_lr=0.001, bsz=bsz, lr_scale_mode="sqrt",
    )
    sched = XyzLrSchedule(lr_init=1.6e-3 * lr_scale, lr_final=1.6e-5 * lr_scale,
                          lr_delay_mult=0.01, max_steps=1000)

    losses = []
    for _ in range(60):
        state, metrics = train_step(
            state, cams, gt_u8, bg, cfg, sh_degree, bsz,
            lambda_dssim=0.2, lrs=lrs, xyz_sched=sched,
        )
        losses.append(float(metrics["loss"]))

    assert losses[-1] < losses[0] * 0.5, f"loss did not halve: {losses[::10]}"
    # PSNR of view 0 should be decent after overfitting
    from grendel_tpu.cameras import camera_arrays
    img, _ = render_image(state.params, state.alive,
                          camera_arrays(cams_host[0]), sh_degree, cfg, bg=bg)
    p = float(psnr(jnp.clip(img, 0, 1), gt[0]))
    assert p > 25.0, f"psnr too low after training: {p}"
    # iteration advanced by bsz per step
    assert int(state.iteration) == 60 * bsz


def test_train_step_then_densify_roundtrip():
    """train_step -> densify_and_prune -> train_step chain stays well-formed."""
    h, w = 32, 32
    cfg = RenderConfig(img_h=h, img_w=w, isect_capacity=2048, max_per_tile=128,
                       chunk=32)
    cam_host = make_test_camera(w, h)
    cams = batch_camera_arrays([cam_host])
    bg = jnp.zeros(3)
    key = jax.random.key(3)
    params, alive = _make_params(key, 40, 64, sh_degree=0)
    state = train_state_init(params, alive)
    gt_u8 = jnp.zeros((1, 3, h, w), jnp.uint8)

    lrs, _ = scaled_lrs(0.0025, 0.05, 0.005, 0.001, bsz=1)
    sched = XyzLrSchedule(1.6e-4, 1.6e-6, 0.01, 30000)

    for _ in range(3):
        state, m = train_step(state, cams, gt_u8, bg, cfg, 0, 1,
                              lambda_dssim=0.2, lrs=lrs, xyz_sched=sched)
    assert float(jnp.sum(state.stats.denom)) > 0  # stats accumulated

    p2, a2, adam2, stats2, info = densify_and_prune(
        state.params, state.alive, state.adam, state.stats, jax.random.key(0),
        grad_threshold=1e-9, min_opacity=0.005, extent=5.0,
        percent_dense=0.01, use_size_prune=False,
    )
    state = TrainState(p2, a2, adam2, stats2, state.iteration)
    state, m = train_step(state, cams, gt_u8, bg, cfg, 0, 1,
                          lambda_dssim=0.2, lrs=lrs, xyz_sched=sched)
    assert np.isfinite(float(m["loss"]))
