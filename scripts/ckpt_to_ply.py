"""Convert a training checkpoint (chkpnt_ws*_rk*.npz shards) into the
point_cloud/iteration_N PLY layout that render.py / metrics.py consume.

Lets the offline render+metrics pipeline run from ANY checkpoint, not
just --save_iterations models — e.g. after a run was cut at a checkpoint
boundary (ref analogue: the torch checkpoints also contain the full
model, train_internal.py:287-313, but the reference ships a separate
.ply for its render.py the same way).

Usage: python scripts/ckpt_to_ply.py -m <model_path> [--iteration N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", "-m", required=True)
    ap.add_argument("--iteration", type=int, default=0,
                    help="checkpoint iteration (default: latest)")
    a = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")   # pure host work

    import numpy as np

    from grendel_tpu.engine.checkpoint import (
        find_latest_checkpoint, load_checkpoint_sharded,
    )
    from grendel_tpu.engine.gaussian_io import save_ply

    if a.iteration:
        ckpt = os.path.join(a.model_path, "checkpoints", str(a.iteration))
    else:
        ckpt = find_latest_checkpoint(a.model_path)
    assert ckpt and os.path.isdir(ckpt), f"no checkpoint under {a.model_path}"
    state = load_checkpoint_sharded(ckpt, world_size=1)
    it = int(np.asarray(state.iteration))
    out = os.path.join(a.model_path, "point_cloud", f"iteration_{it}")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "point_cloud.ply")
    save_ply(path, state.params, np.asarray(state.alive))
    n = int(np.asarray(state.alive).sum())
    print(f"wrote {path}: {n} gaussians at iteration {it}")


if __name__ == "__main__":
    main()
