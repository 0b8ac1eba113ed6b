"""Front-to-back alpha blending math shared by all rasterizer backends.

Defines the exact blending semantics of the reference rasterizer's
per-pixel loop (SURVEY.md §2.9 ``render_gaussians``): for each pixel,
walk Gaussians front-to-back; alpha = min(0.99, opacity * exp(power));
skip if power > 0 or alpha < 1/255; stop before the contribution that
would push transmittance below 1e-4. Expressed vectorially with cumulative
products so it maps onto TPU vector units and stays differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def splat_alpha(dx: Array, dy: Array, conic: Array, opacity: Array) -> Array:
    """Alpha of Gaussians at pixel offsets.

    dx, dy: (K, P) pixel-minus-mean offsets; conic: (K, 3); opacity: (K,).
    Returns (K, P) alphas with the reference's clamping/skip rules applied
    (skipped contributions are exactly 0).
    """
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, opacity[:, None] * jnp.exp(power))
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
    return jnp.where(keep, alpha, 0.0)


def blend_weights(alphas: Array, t_in: Array):
    """Sequential front-to-back weights from a block of alphas.

    alphas: (K, P) in front-to-back order (zeros = skipped).
    t_in:   (P,) incoming transmittance.

    Returns (weights (K,P), t_out (P,)). A contribution is included iff the
    transmittance *after* it stays >= T_EPS (the reference's stop rule);
    because transmittance decreases monotonically the mask needs no scan.
    """
    one_minus = 1.0 - alphas
    inc = t_in[None, :] * jnp.cumprod(one_minus, axis=0)   # T after each entry
    exc = jnp.concatenate([t_in[None, :], inc[:-1]], axis=0)  # T before each entry
    include = inc >= T_EPS
    weights = jnp.where(include, alphas * exc, 0.0)
    t_out = jnp.min(jnp.where(include, inc, t_in[None, :]), axis=0)
    return weights, t_out
