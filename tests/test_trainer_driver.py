"""Trainer driver integration: schedule, growth, eval, saves on a CPU mesh."""

import os

import numpy as np
import jax
import pytest

from grendel_tpu.config import TrainConfig
from grendel_tpu.engine.trainer import Trainer
from grendel_tpu.testing import SyntheticScene


@pytest.fixture(scope="module")
def tiny_scene():
    return SyntheticScene(n_cams=6, n_test=2, width=64, height=48,
                          n_gaussians=120, n_init_points=100, sh_degree=1,
                          seed=3)


def _config(tmp_path, iters=30, bsz=2):
    cfg = TrainConfig()
    cfg.model.sh_degree = 1
    cfg.model.model_path = str(tmp_path)
    o = cfg.opt
    o.iterations = iters
    o.densify_from_iter = 8
    o.densification_interval = 10
    o.densify_until_iter = iters
    o.opacity_reset_interval = 10 ** 9
    o.densify_grad_threshold = 1e-9      # densify aggressively
    cfg.dist.bsz = bsz
    cfg.dist.redistribute_gaussians_frequency = 2
    cfg.test_iterations = [iters]
    cfg.save_iterations = [iters]
    cfg.checkpoint_iterations = [iters]
    cfg.log_interval = 10
    return cfg.finalize()


def test_trainer_end_to_end_with_growth(tiny_scene, tmp_path, eight_devices):
    cfg = _config(tmp_path)
    trainer = Trainer(cfg, tiny_scene, devices=eight_devices)
    trainer.train()

    it = int(jax.device_get(trainer.state.iteration))
    assert it >= cfg.opt.iterations
    n_alive = int(np.asarray(trainer.state.alive).sum())
    assert n_alive > 100  # densification grew beyond the initial points

    # artifacts
    assert os.path.exists(
        os.path.join(str(tmp_path), "point_cloud", f"iteration_{it}",
                     "point_cloud.ply"))
    ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # eval runs and returns sane numbers
    r = trainer.eval_psnr(tiny_scene.test_cameras, sh_degree=0)
    assert np.isfinite(r["psnr"]) and r["psnr"] > 5.0

    # explicit capacity growth preserves state and training continues
    n_local_before = trainer.n_local
    alive_before = n_alive
    means_before = np.sort(
        np.asarray(trainer.state.params.means3d)[
            np.asarray(trainer.state.alive)][:, 0])
    trainer._grow_capacity()
    assert trainer.n_local == 2 * n_local_before
    assert int(np.asarray(trainer.state.alive).sum()) == alive_before
    means_after = np.sort(
        np.asarray(trainer.state.params.means3d)[
            np.asarray(trainer.state.alive)][:, 0])
    np.testing.assert_allclose(means_after, means_before)
    trainer.train(iterations=it + 4)
    assert int(jax.device_get(trainer.state.iteration)) >= it + 4


def test_trainer_resume_from_checkpoint(tiny_scene, tmp_path, eight_devices):
    cfg = _config(tmp_path / "a", iters=20)
    t1 = Trainer(cfg, tiny_scene, devices=eight_devices)
    t1.train()
    it1 = int(jax.device_get(t1.state.iteration))

    cfg2 = _config(tmp_path / "a", iters=24)
    ckpt = os.path.join(str(tmp_path / "a"), "checkpoints", str(it1))
    cfg2.start_checkpoint = ckpt
    t2 = Trainer(cfg2, tiny_scene, devices=eight_devices)
    assert int(jax.device_get(t2.state.iteration)) == it1
    t2.train()
    assert int(jax.device_get(t2.state.iteration)) >= 24
