"""Gaussian model state: a padded-capacity pytree of raw parameters.

The reference keeps six dynamically-sized parameter tensors plus an alive
count that changes every densification (behavioral contract:
/root/reference/scene/gaussian_model.py:54-59, 219-228 — _xyz, _features_dc,
_features_rest, _scaling, _rotation, _opacity with exp/sigmoid/normalize
activations at L34-49). Dynamic shapes would force an XLA recompile every
densification, so the TPU design is:

  * every array has a fixed capacity N (the leading axis), a power-of-two
    chosen by the host;
  * an ``alive`` bool mask marks live slots; dead slots render as opacity 0;
  * densify/prune are masked scatters into free slots (models/densify.py);
  * the host grows capacity (a controlled recompile) when occupancy crosses
    a threshold.

Raw (pre-activation) parameterization matches the reference: log-scales,
logit-opacity, unnormalized quaternions, SH split into DC and rest bands so
the optimizer can give them different learning rates.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops
from ..ops.knn import mean_dist2_to_knn
from ..utils.math3d import inverse_sigmoid

Array = jnp.ndarray


class GaussianParams(NamedTuple):
    """Differentiable model parameters. All leaves have leading axis = capacity."""

    means3d: Array        # (N, 3) world-space positions
    sh_dc: Array          # (N, 1, 3) SH DC band
    sh_rest: Array        # (N, K-1, 3) higher SH bands (K = (max_deg+1)^2)
    scales_raw: Array     # (N, 3) log-scales
    quats: Array          # (N, 4) unnormalized quaternions [w, x, y, z]
    opacities_raw: Array  # (N,) logit-opacity


class ActivatedGaussians(NamedTuple):
    means3d: Array    # (N, 3)
    scales: Array     # (N, 3) exp
    quats: Array      # (N, 4) still unnormalized (projection normalizes)
    opacities: Array  # (N,) sigmoid
    sh: Array         # (N, K, 3) concatenated SH


def activated(params: GaussianParams) -> ActivatedGaussians:
    """Apply the standard 3DGS activations (ref: gaussian_model.py:34-49)."""
    return ActivatedGaussians(
        means3d=params.means3d,
        scales=jnp.exp(params.scales_raw),
        quats=params.quats,
        opacities=jax.nn.sigmoid(params.opacities_raw),
        sh=jnp.concatenate([params.sh_dc, params.sh_rest], axis=1),
    )


def num_sh_rest(max_sh_degree: int) -> int:
    return (max_sh_degree + 1) ** 2 - 1


def empty_params(capacity: int, max_sh_degree: int = 3) -> GaussianParams:
    k_rest = num_sh_rest(max_sh_degree)
    z = jnp.zeros
    return GaussianParams(
        means3d=z((capacity, 3), jnp.float32),
        sh_dc=z((capacity, 1, 3), jnp.float32),
        sh_rest=z((capacity, k_rest, 3), jnp.float32),
        scales_raw=jnp.full((capacity, 3), -10.0, jnp.float32),
        quats=z((capacity, 4), jnp.float32).at[:, 0].set(1.0),
        opacities_raw=jnp.full((capacity,), -10.0, jnp.float32),
    )


def init_from_pcd(
    points: np.ndarray,      # (M, 3)
    colors: np.ndarray,      # (M, 3) in [0, 1]
    capacity: int,
    max_sh_degree: int = 3,
    n_shards: int = 1,
) -> Tuple[GaussianParams, Array]:
    """Initialize from a (host) point cloud; returns (params, alive).

    Semantics match the reference's ``create_from_pcd``
    (/root/reference/scene/gaussian_model.py:140-232): SH DC from RGB2SH,
    rest zero; isotropic log-scale from sqrt of the clamped mean squared
    distance to the 3 nearest neighbors; identity rotation; opacity 0.1.

    ``n_shards`` > 1 block-splits the points across equal capacity blocks
    (shard d gets contiguous chunk d at offset d * capacity/n_shards) —
    the reference's per-rank chunk split (gaussian_model.py:183-199), so a
    P('d')-sharded mesh starts load-balanced instead of all-on-device-0.
    """
    m = points.shape[0]
    if m > capacity:
        raise ValueError(f"point cloud ({m}) exceeds capacity ({capacity})")
    assert capacity % n_shards == 0
    dist2 = np.maximum(mean_dist2_to_knn(points, k=3), 1e-7)
    log_scale = np.log(np.sqrt(dist2))

    block = capacity // n_shards
    idx = np.concatenate([
        d * block + np.arange((d + 1) * m // n_shards - d * m // n_shards)
        for d in range(n_shards)
    ]).astype(np.int64)
    assert idx.shape[0] == m and (m == 0 or idx.max() < capacity)
    idx_j = jnp.asarray(idx)

    base = empty_params(capacity, max_sh_degree)
    params = GaussianParams(
        means3d=base.means3d.at[idx_j].set(jnp.asarray(points, jnp.float32)),
        sh_dc=base.sh_dc.at[idx_j].set(
            jnp.asarray(sh_ops.rgb_to_sh(np.asarray(colors, np.float32)))[:, None, :]
        ),
        sh_rest=base.sh_rest,
        scales_raw=base.scales_raw.at[idx_j].set(
            jnp.asarray(log_scale, jnp.float32)[:, None].repeat(3, axis=1)
        ),
        quats=base.quats,
        opacities_raw=base.opacities_raw.at[idx_j].set(
            float(inverse_sigmoid(jnp.asarray(0.1)))
        ),
    )
    alive = jnp.zeros((capacity,), bool).at[idx_j].set(True)
    return params, alive


def pad_to_capacity(params: GaussianParams, alive: Array,
                    new_capacity: int) -> Tuple[GaussianParams, Array]:
    """Grow the capacity axis (host-triggered recompile point)."""
    old = alive.shape[0]
    if new_capacity < old:
        raise ValueError("cannot shrink capacity")
    pad = new_capacity - old

    def grow(x, fill):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    new_params = GaussianParams(
        means3d=grow(params.means3d, 0.0),
        sh_dc=grow(params.sh_dc, 0.0),
        sh_rest=grow(params.sh_rest, 0.0),
        scales_raw=grow(params.scales_raw, -10.0),
        quats=grow(params.quats, 0.0).at[old:, 0].set(1.0),
        opacities_raw=grow(params.opacities_raw, -10.0),
    )
    return new_params, grow(alive, False)


def count_alive(alive: Array) -> Array:
    return jnp.sum(alive.astype(jnp.int32))


def round_capacity(n: int, multiple: int = 256) -> int:
    """Round a desired capacity up to a TPU-friendly multiple."""
    return int(-(-n // multiple) * multiple)
