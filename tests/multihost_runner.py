"""Multi-process (multi-host) training runner, invoked as a subprocess by
test_multihost.py — one OS process per simulated host, each owning 4 virtual
CPU devices of an 8-device global mesh.

Exercises the GRENDEL_MULTIHOST topology of scripts/train.py (ref process
model: one rank per GPU with torch.distributed, SURVEY.md §1 /
/root/reference/utils/general_utils.py:194-234) as JAX multi-controller
SPMD: jax.distributed.initialize + per-host GT packing + replicated
telemetry. Writes the per-step loss trajectory as JSON for the parity
assertion against a single-process run.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--out", type=str, required=True)
    a = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if a.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{a.port}",
            num_processes=a.num_processes,
            process_id=a.process_id,
        )
    assert len(jax.devices()) == 8, jax.devices()

    from grendel_tpu.config import TrainConfig
    from grendel_tpu.engine.trainer import Trainer
    from grendel_tpu.testing import SyntheticScene

    scene = SyntheticScene(n_cams=6, n_test=2, width=64, height=48,
                           n_gaussians=120, n_init_points=100, sh_degree=1,
                           seed=3)
    cfg = TrainConfig()
    cfg.model.sh_degree = 1
    cfg.model.model_path = os.path.dirname(a.out)
    cfg.dist.preload_dataset_to_gpu_threshold = 0  # host GT-packing path
    o = cfg.opt
    o.iterations = a.iters
    o.densify_from_iter = 10 ** 9          # schedule-free: pure step parity
    o.densify_until_iter = 0
    o.opacity_reset_interval = 10 ** 9
    cfg.dist.bsz = 2
    cfg.dist.redistribute_gaussians_frequency = 0
    cfg.test_iterations = []
    cfg.save_iterations = []
    cfg.checkpoint_iterations = []
    cfg.log_interval = 10 ** 9
    cfg = cfg.finalize()

    trainer = Trainer(cfg, scene, devices=jax.devices())

    # tap the jitted step to record every loss (device_get of a fully
    # replicated scalar — valid on every process)
    losses = []
    get_trainer = trainer._trainer

    def tapped(sh_degree):
        st = get_trainer(sh_degree)
        if not getattr(st, "_loss_tapped", False):
            real_step = st.step

            def step(*args, **kw):
                new_state, metrics = real_step(*args, **kw)
                losses.append(float(jax.device_get(metrics["loss"])))
                return new_state, metrics

            st.step = step
            st._loss_tapped = True
        return st

    trainer._trainer = tapped
    trainer.train()

    import jax.numpy as jnp

    # collective sum -> replicated scalar: fetchable on every process
    n_alive = int(jax.device_get(jnp.sum(trainer.state.alive)))
    with open(a.out, "w") as f:
        json.dump({
            "losses": losses,
            "process_count": jax.process_count(),
            "n_alive": n_alive,
        }, f)
    print("runner done", flush=True)


if __name__ == "__main__":
    main()
