"""Single-chip training step: render batch -> loss -> backward -> Adam.

The jitted core of the training loop (reference hot path documented in
SURVEY.md §3.1, /root/reference/train_internal.py:95-342): one step renders
``bsz`` cameras, sums their losses, backprops to the Gaussian parameters,
divides gradients by bsz (unless lr_scale_mode == "accumu",
ref train_internal.py:319-324), accumulates densification stats from the
screen-space position gradients, and applies one Adam step with the
exponential xyz LR schedule evaluated at the current iteration.

The step is a pure function of TrainState; the Python driver around it
handles the densification schedule, SH ramp, eval, and capacity growth.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..cameras import CameraArrays
from ..models.gaussian_model import GaussianParams
from ..models.optimizer import AdamState, LrConfig, adam_init, adam_step, expon_lr
from ..models.densify import (
    DensifyStats,
    densify_stats_init,
    accumulate_densify_stats,
)
from .render import RenderConfig, render_batch
from .loss import batch_loss

Array = jnp.ndarray


class TrainState(NamedTuple):
    params: GaussianParams
    alive: Array            # (N,) bool
    adam: AdamState
    stats: DensifyStats
    iteration: Array        # () int32 — advances by bsz per step (ref convention)


class XyzLrSchedule(NamedTuple):
    """Endpoints already multiplied by spatial_lr_scale * lr_scale (ref:
    gaussian_model.py:313-331)."""

    lr_init: float
    lr_final: float
    lr_delay_mult: float
    max_steps: int

    def __call__(self, step: Array) -> Array:
        return expon_lr(
            step, self.lr_init, self.lr_final,
            lr_delay_steps=0, lr_delay_mult=self.lr_delay_mult,
            max_steps=self.max_steps,
        )


def train_state_init(params: GaussianParams, alive: Array,
                     start_iteration: int = 0) -> TrainState:
    return TrainState(
        params=params,
        alive=alive,
        adam=adam_init(params),
        stats=densify_stats_init(alive.shape[0]),
        iteration=jnp.asarray(start_iteration, jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "render_cfg", "sh_degree", "bsz", "lambda_dssim", "lr_scale_mode",
        "lrs", "xyz_sched", "lr_scale_loss",
    ),
)
def train_step(
    state: TrainState,
    cams: CameraArrays,          # batched (bsz, ...) leaves
    gt_u8: Array,                # (bsz, 3, H, W) uint8 GT images
    bg: Array,                   # (3,) background color
    render_cfg: RenderConfig,
    sh_degree: int,
    bsz: int,
    lambda_dssim: float,
    lrs: LrConfig,
    xyz_sched: XyzLrSchedule,
    lr_scale_mode: str = "sqrt",
    lr_scale_loss: float = 1.0,
) -> Tuple[TrainState, dict]:
    """One fully-jitted training step. Returns (new_state, metrics)."""
    n = state.alive.shape[0]
    gt = gt_u8.astype(jnp.float32) / 255.0

    def loss_fn(params: GaussianParams, tap: Array):
        images, splats, aux = render_batch(
            params, state.alive, cams, sh_degree, render_cfg,
            bg=bg, means2d_tap=tap,
        )
        loss, per_cam = batch_loss(
            images, gt, lambda_dssim, lr_scale_loss=lr_scale_loss
        )
        return loss, (per_cam, splats.radii, aux.num_isects)

    tap = jnp.zeros((bsz, n, 2), jnp.float32)
    (loss, (per_cam, radii, num_isects)), (grads, tap_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, tap)

    # Grad scale: param.grad /= bsz unless "accumu" (ref train_internal.py:319-324).
    if lr_scale_mode != "accumu":
        grads = jax.tree.map(lambda g: g / bsz, grads)

    stats = accumulate_densify_stats(
        state.stats, tap_grad, radii, render_cfg.img_w, render_cfg.img_h
    )

    xyz_lr = xyz_sched(state.iteration)
    params, adam = adam_step(state.params, grads, state.adam, lrs, xyz_lr,
                             state.alive)

    new_state = TrainState(
        params=params,
        alive=state.alive,
        adam=adam,
        stats=stats,
        iteration=state.iteration + bsz,
    )
    metrics = {
        "loss": loss,
        "l1": per_cam[:, 0],
        "ssim": per_cam[:, 1],
        "xyz_lr": xyz_lr,
        "num_isects": num_isects,
    }
    return new_state, metrics
