"""Multi-host (2-process) training parity on a CPU mesh.

The same 8-device synthetic training runs once as a single process and
once as two JAX processes (4 addressable devices each) coordinated via
jax.distributed — the multi-controller topology a TPU pod slice uses
(scripts/train.py GRENDEL_MULTIHOST; ref: one torch.distributed rank per
GPU, /root/reference/utils/general_utils.py:194-234). Loss trajectories
must match: every host computes the same division, packs only its own GT
rows, and reads only replicated telemetry.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_RUNNER = os.path.join(os.path.dirname(__file__), "multihost_runner.py")
_ITERS = 24


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(num_processes, tmp, tag, n_local_devices, extra=(), iters=_ITERS):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    env.pop("JAX_PLATFORMS", None)
    port = _free_port()
    procs, outs = [], []
    for pid in range(num_processes):
        out = os.path.join(tmp, f"{tag}_p{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, _RUNNER,
             "--process_id", str(pid),
             "--num_processes", str(num_processes),
             "--port", str(port),
             "--iters", str(iters),
             "--out", out, *extra],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"runner failed:\n{log[-4000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_process_training_matches_single_process(tmp_path):
    tmp = str(tmp_path)
    (single,) = _run(1, tmp, "single", n_local_devices=8)
    duo = _run(2, tmp, "duo", n_local_devices=4)

    assert single["process_count"] == 1
    assert all(d["process_count"] == 2 for d in duo)
    # both processes of the duo observe the identical replicated loss
    np.testing.assert_allclose(duo[0]["losses"], duo[1]["losses"],
                               rtol=0, atol=0)
    # and the 2-process run reproduces the single-process trajectory
    assert len(single["losses"]) == _ITERS // 2
    np.testing.assert_allclose(duo[0]["losses"], single["losses"],
                               rtol=2e-5, atol=2e-6)
    assert duo[0]["n_alive"] == single["n_alive"]


def test_two_process_full_schedule_matches_single_process(tmp_path):
    """Densify (with a forced capacity-growth recompile), redistribution,
    opacity reset, per-shard checkpoint save and a resume all run under 2
    processes and reproduce the single-process trajectory — the host-driven
    recompile paths are the documented multi-controller desync hazard
    (parallel/sharded.py compiled-bytes note; ref densification.py:46-60 +
    train_internal.py:287-313)."""
    tmp = str(tmp_path)
    iters = 48       # densify #6 overflows the 256/shard capacity -> growth
    (single,) = _run(1, tmp, "fs_single", n_local_devices=8,
                     extra=["--full_schedule"], iters=iters)
    duo = _run(2, tmp, "fs_duo", n_local_devices=4,
               extra=["--full_schedule"], iters=iters)

    # the risky events actually happened
    assert single["grew_capacity"], single["densify_history"]
    assert len(single["densify_history"]) >= 3
    # both processes observe identical replicated telemetry
    assert duo[0]["densify_history"] == duo[1]["densify_history"]
    np.testing.assert_allclose(duo[0]["losses"], duo[1]["losses"],
                               rtol=0, atol=0)
    # 2-process == 1-process: losses, densify trajectory, capacity growth
    np.testing.assert_allclose(duo[0]["losses"], single["losses"],
                               rtol=2e-5, atol=2e-6)
    assert duo[0]["densify_history"] == single["densify_history"]
    assert duo[0]["n_local"] == single["n_local"]
    assert duo[0]["grew_capacity"]
    assert duo[0]["n_alive"] == single["n_alive"]
    # checkpoint resume: shard files written across BOTH processes loaded
    # into a consistent state on each
    assert duo[0]["resume_from"] == single["resume_from"] > 0
    assert duo[0]["resume_n_alive"] == duo[1]["resume_n_alive"]
    # per-host GT decode policy: strided storage partitions the dataset
    m0, m1 = duo[0]["decode_mask"], duo[1]["decode_mask"]
    assert sum(m0) + sum(m1) == 12 and not any(a and b
                                               for a, b in zip(m0, m1))
    # local_sampling policy: host h stores cameras of its own device groups
    l0, l1 = (duo[0]["decode_mask_local_sampling"],
              duo[1]["decode_mask_local_sampling"])
    assert sum(l0) + sum(l1) == 12 and not any(a and b
                                               for a, b in zip(l0, l1))
    # single process: no masking at all
    assert single["decode_mask"] is None
