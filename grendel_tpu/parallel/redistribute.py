"""Random Gaussian redistribution: re-balance shards via all-to-all.

Parity target: /root/reference/scene/gaussian_model.py:1066-1329
(`redistribute_gaussians`): every few densifications (or when the max/min
shard-size ratio exceeds a threshold) each Gaussian picks a uniformly
random destination shard and the parameters *plus Adam moments* move there
in one all-to-all; destination uniformity keeps shards balanced in
expectation.

TPU static-shape design: fixed per-destination send capacity; entries that
overflow a send bucket simply STAY on their current shard (no loss, just
slightly less perfect balance — reported). On the receive side, entries
land in free slots; if a shard lacks free slots the surplus would be lost,
so the step reports ``recv_dropped`` and the host must treat the result as
invalid, grow capacity, and retry (capacity growth is already a recompile
point). With destination uniformity and the standard 10-25% capacity
headroom this is virtually never hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.gaussian_model import GaussianParams
from ..models.optimizer import AdamState

AXIS = "d"


def _flatten_tree(params: GaussianParams) -> jnp.ndarray:
    """(N, F) concat of all leaves, row-major per leaf."""
    n = params.means3d.shape[0]
    return jnp.concatenate(
        [jnp.reshape(leaf, (n, -1)) for leaf in params], axis=-1
    )


def _unflatten_tree(flat: jnp.ndarray, template: GaussianParams) -> GaussianParams:
    out = []
    ofs = 0
    n = flat.shape[0]
    for leaf in template:
        size = 1
        for s in leaf.shape[1:]:
            size *= s
        out.append(flat[:, ofs:ofs + size].reshape((n,) + leaf.shape[1:]))
        ofs += size
    return GaussianParams(*out)


def build_redistribute(mesh: Mesh, n_devices: int, send_cap: int):
    """Compile the redistribution step for a mesh + static capacity.

    Returns fn(params, alive, adam, key) ->
      (params, alive, adam, info (D, 3) [n_sent, send_overflow, recv_dropped]).
    """

    def shard_fn(params: GaussianParams, alive, adam: AdamState, key):
        d_idx = jax.lax.axis_index(AXIS)
        n_loc = alive.shape[0]
        key = jax.random.fold_in(key, d_idx)

        dest = jnp.where(
            alive,
            jax.random.randint(key, (n_loc,), 0, n_devices),
            n_devices,
        ).astype(jnp.int32)
        # self-destined entries never move (saves bucket space)
        dest = jnp.where(dest == d_idx, n_devices, dest)

        perm = jnp.argsort(dest, stable=True)
        sorted_dest = dest[perm]
        starts = jnp.searchsorted(
            sorted_dest, jnp.arange(n_devices + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        pos = jnp.arange(n_loc, dtype=jnp.int32)
        rank = pos - starts[jnp.clip(sorted_dest, 0, n_devices - 1)]
        in_cap = (sorted_dest < n_devices) & (rank < send_cap)
        slot = jnp.where(in_cap, sorted_dest * send_cap + rank,
                         n_devices * send_cap)
        send_overflow = jnp.sum(
            jnp.maximum(jnp.diff(starts) - send_cap, 0))
        n_sent = jnp.sum(in_cap)

        payload = jnp.concatenate(
            [_flatten_tree(params), _flatten_tree(adam.mu),
             _flatten_tree(adam.nu),
             jnp.ones((n_loc, 1), jnp.float32)],       # valid flag
            axis=-1,
        )
        f_tot = payload.shape[1]
        buf = (
            jnp.zeros((n_devices * send_cap, f_tot), jnp.float32)
            .at[slot].set(payload[perm], mode="drop")
            .reshape(n_devices, send_cap, f_tot)
        )
        recv = jax.lax.all_to_all(
            buf, AXIS, split_axis=0, concat_axis=0
        ).reshape(n_devices * send_cap, f_tot)

        # remove the moved entries locally (kept if their bucket overflowed)
        sent_slots = jnp.zeros((n_loc,), bool).at[perm].set(in_cap)
        stay = alive & ~sent_slots

        # place received entries in free slots
        valid = recv[:, -1] > 0
        free_order = jnp.argsort(stay)            # dead-first, stable
        n_free = n_loc - jnp.sum(stay)
        r_rank = jnp.cumsum(valid) - 1
        ok = valid & (r_rank < n_free)
        dst = jnp.where(ok, free_order[jnp.clip(r_rank, 0, n_loc - 1)], n_loc)
        recv_dropped = jnp.sum(valid) - jnp.sum(ok)

        # payload layout: [params | mu | nu | flag]
        f_leaf = _flatten_tree(params).shape[1]
        p_flat = _flatten_tree(params).at[dst].set(
            recv[:, 0:f_leaf], mode="drop")
        mu_flat = _flatten_tree(adam.mu).at[dst].set(
            recv[:, f_leaf:2 * f_leaf], mode="drop")
        nu_flat = _flatten_tree(adam.nu).at[dst].set(
            recv[:, 2 * f_leaf:3 * f_leaf], mode="drop")

        new_params = _unflatten_tree(p_flat, params)
        new_adam = AdamState(
            mu=_unflatten_tree(mu_flat, params),
            nu=_unflatten_tree(nu_flat, params),
            count=adam.count,
        )
        new_alive = stay.at[dst].set(True, mode="drop")
        # replicated (D, 3) so every multi-host process can fetch it
        info = jax.lax.all_gather(
            jnp.stack([n_sent, send_overflow, recv_dropped]).astype(
                jnp.int32), AXIS)
        return new_params, new_alive, new_adam, info

    p_params = GaussianParams(*(P(AXIS) for _ in GaussianParams._fields))
    adam_spec = AdamState(mu=p_params, nu=p_params, count=P())
    return jax.jit(shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(p_params, P(AXIS), adam_spec, P()),
        out_specs=(p_params, P(AXIS), adam_spec, P()),
        check_vma=False,
    ))
