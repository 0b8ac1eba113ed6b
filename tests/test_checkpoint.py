"""Checkpoint + PLY model IO tests, including world-size elasticity."""

import numpy as np
import jax.numpy as jnp

from grendel_tpu.engine.checkpoint import (
    save_checkpoint, load_checkpoint, find_latest_checkpoint,
)
from grendel_tpu.engine.gaussian_io import save_ply, load_ply
from grendel_tpu.engine.train import train_state_init
from grendel_tpu.models import GaussianParams, count_alive


def _params(n, cap, seed=0):
    rng = np.random.default_rng(seed)

    def r(*shape):
        out = np.zeros((cap,) + shape, np.float32)
        out[:n] = rng.normal(size=(n,) + shape).astype(np.float32)
        return jnp.asarray(out)

    params = GaussianParams(
        means3d=r(3), sh_dc=r(1, 3), sh_rest=r(15, 3),
        scales_raw=r(3), quats=r(4), opacities_raw=r(),
    )
    alive = jnp.asarray(np.arange(cap) < n)
    return params, alive


def test_checkpoint_roundtrip_same_ws(tmp_path):
    params, alive = _params(37, 64)
    state = train_state_init(params, alive, start_iteration=123)
    state = state._replace(
        adam=state.adam._replace(
            count=jnp.asarray(5, jnp.int32),
            mu=state.adam.mu._replace(means3d=params.means3d * 0.5),
        )
    )
    save_checkpoint(str(tmp_path), state, rank=0, world_size=1)
    back = load_checkpoint(str(tmp_path), rank=0, world_size=1, capacity=64)
    assert int(back.iteration) == 123
    assert int(count_alive(back.alive)) == 37
    np.testing.assert_allclose(
        np.asarray(back.params.means3d[:37]), np.asarray(params.means3d[:37])
    )
    # Adam restored on same world size
    assert int(back.adam.count) == 5
    np.testing.assert_allclose(
        np.asarray(back.adam.mu.means3d[:37]),
        np.asarray(params.means3d[:37]) * 0.5, rtol=1e-6,
    )


def test_checkpoint_elastic_split_and_merge(tmp_path):
    # save from ws=2, load into ws=1 (merge) and ws=4 (split)
    pa, aa = _params(20, 32, seed=1)
    pb, ab = _params(12, 32, seed=2)
    sa = train_state_init(pa, aa, start_iteration=77)
    sb = train_state_init(pb, ab, start_iteration=77)
    save_checkpoint(str(tmp_path), sa, rank=0, world_size=2)
    save_checkpoint(str(tmp_path), sb, rank=1, world_size=2)

    merged = load_checkpoint(str(tmp_path), rank=0, world_size=1)
    assert int(count_alive(merged.alive)) == 32
    np.testing.assert_allclose(
        np.asarray(merged.params.means3d[:20]), np.asarray(pa.means3d[:20])
    )
    np.testing.assert_allclose(
        np.asarray(merged.params.means3d[20:32]), np.asarray(pb.means3d[:12])
    )
    # Adam dropped on reshard
    assert int(merged.adam.count) == 0

    quarter = load_checkpoint(str(tmp_path), rank=3, world_size=4)
    assert int(count_alive(quarter.alive)) == 8
    np.testing.assert_allclose(
        np.asarray(quarter.params.means3d[:8]), np.asarray(pb.means3d[4:12])
    )


def test_find_latest_checkpoint(tmp_path):
    assert find_latest_checkpoint(str(tmp_path)) is None
    for it in (100, 900, 5000):
        (tmp_path / "checkpoints" / str(it)).mkdir(parents=True)
    assert find_latest_checkpoint(str(tmp_path)).endswith("5000")


def test_ply_model_roundtrip(tmp_path):
    params, alive = _params(25, 32, seed=3)
    path = str(tmp_path / "point_cloud.ply")
    save_ply(path, params, np.asarray(alive))
    back, back_alive = load_ply(path, capacity=64)
    assert int(count_alive(back_alive)) == 25
    for f in GaussianParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(back, f))[:25],
            np.asarray(getattr(params, f))[:25], rtol=1e-6,
            err_msg=f,
        )


def test_ply_distributed_save_load(tmp_path):
    pa, aa = _params(10, 16, seed=4)
    pb, ab = _params(6, 16, seed=5)
    d = str(tmp_path)
    save_ply(f"{d}/point_cloud_rk0_ws2.ply", pa, np.asarray(aa))
    save_ply(f"{d}/point_cloud_rk1_ws2.ply", pb, np.asarray(ab))
    # merge all shards, re-shard into 2: rank 1 gets the second half
    back, back_alive = load_ply(d, shard=(1, 2))
    assert int(count_alive(back_alive)) == 8
    np.testing.assert_allclose(
        np.asarray(back.means3d[:2]), np.asarray(pa.means3d[8:10]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(back.means3d[2:8]), np.asarray(pb.means3d[:6]), rtol=1e-6
    )
