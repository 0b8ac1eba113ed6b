"""Adam optimizer with per-leaf learning rates and batch-size scaling.

Reproduces the reference's optimizer setup (behavioral contract:
/root/reference/scene/gaussian_model.py:244-331):

  * six parameter groups with individual LRs (xyz follows an exponential
    schedule, features_rest = feature_lr / 20, etc.), Adam eps = 1e-15;
  * batch-size scaling rules — "sqrt" (default): lr *= sqrt(bsz),
    eps /= sqrt(bsz), betas = betas ** bsz; "linear": lr *= bsz;
    "accumu": no scaling (gradients are accumulated, not averaged);
  * the exponential xyz LR schedule (ref: utils/general_utils.py:364-397,
    the JaxNeRF/Plenoxels log-lerp decay with sine delay ramp).

Hand-rolled rather than optax because densification performs "optimizer
state surgery" (zeroing moments of re-allocated slots, resetting the
opacity moments on opacity reset — ref: gaussian_model.py:771-1044), which
is natural on a transparent NamedTuple state and awkward through optax's
opaque chains. The update itself is classic bias-corrected Adam, identical
to torch.optim.Adam's decoupled-free path.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .gaussian_model import GaussianParams

Array = jnp.ndarray


class AdamState(NamedTuple):
    mu: GaussianParams     # first moment per leaf
    nu: GaussianParams     # second moment per leaf
    count: Array           # () int32 — shared step count for bias correction


class LrConfig(NamedTuple):
    """Per-leaf LRs (xyz passed per-step via the schedule) + Adam hypers.

    All values are *already batch-size scaled* (see ``scaled_lrs``).
    """

    sh_dc: float
    sh_rest: float
    scales: float
    quats: float
    opacity: float
    beta1: float
    beta2: float
    eps: float


def scaled_lrs(
    feature_lr: float,
    opacity_lr: float,
    scaling_lr: float,
    rotation_lr: float,
    bsz: int,
    lr_scale_mode: str = "sqrt",
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-15,
    lr_scale_pos_and_scale: float = 1.0,
) -> Tuple[LrConfig, float]:
    """Build the (bsz-scaled) static LR config.

    Returns (LrConfig, lr_scale) where lr_scale also multiplies the xyz
    schedule endpoints (ref: gaussian_model.py:295-331).
    """
    if lr_scale_mode == "linear":
        lr_scale = float(bsz)
    elif lr_scale_mode == "sqrt":
        lr_scale = float(jnp.sqrt(float(bsz)))
        eps = eps / lr_scale
        betas = tuple(b ** bsz for b in betas)
    elif lr_scale_mode == "accumu":
        lr_scale = 1.0
    else:
        raise ValueError(f"unknown lr_scale_mode {lr_scale_mode!r}")
    cfg = LrConfig(
        sh_dc=feature_lr * lr_scale,
        sh_rest=feature_lr / 20.0 * lr_scale,
        scales=scaling_lr * lr_scale_pos_and_scale * lr_scale,
        quats=rotation_lr * lr_scale,
        opacity=opacity_lr * lr_scale,
        beta1=betas[0],
        beta2=betas[1],
        eps=eps,
    )
    return cfg, lr_scale


def expon_lr(
    step: Array,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
) -> Array:
    """Log-linear LR decay with optional sine delay ramp (jnp, jittable).

    Parity: utils/general_utils.py:364-397 (the Plenoxels/JaxNeRF helper).
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay * log_lerp)


def adam_init(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=zeros, count=jnp.zeros((), jnp.int32))


def adam_step(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: LrConfig,
    xyz_lr: Array,
    alive: Array,
) -> Tuple[GaussianParams, AdamState]:
    """One bias-corrected Adam step with per-leaf LRs, masked to live slots."""
    count = state.count + 1
    b1, b2 = lrs.beta1, lrs.beta2
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)

    per_leaf_lr = GaussianParams(
        means3d=xyz_lr,
        sh_dc=jnp.asarray(lrs.sh_dc),
        sh_rest=jnp.asarray(lrs.sh_rest),
        scales_raw=jnp.asarray(lrs.scales),
        quats=jnp.asarray(lrs.quats),
        opacities_raw=jnp.asarray(lrs.opacity),
    )

    def update(p, g, m, v, lr):
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        step_dir = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + lrs.eps)
        mask = alive.reshape((-1,) + (1,) * (p.ndim - 1))
        p_new = jnp.where(mask, p - lr * step_dir, p)
        return p_new, m_new, v_new

    triples = {
        f: update(getattr(params, f), getattr(grads, f),
                  getattr(state.mu, f), getattr(state.nu, f),
                  getattr(per_leaf_lr, f))
        for f in GaussianParams._fields
    }
    new_params = GaussianParams(**{f: t[0] for f, t in triples.items()})
    new_mu = GaussianParams(**{f: t[1] for f, t in triples.items()})
    new_nu = GaussianParams(**{f: t[2] for f, t in triples.items()})
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)
