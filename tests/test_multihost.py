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


def _run(num_processes, tmp, tag, n_local_devices):
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
             "--iters", str(_ITERS),
             "--out", out],
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
