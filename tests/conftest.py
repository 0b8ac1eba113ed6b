"""Test harness: force an 8-device CPU JAX backend.

The environment registers a single-chip TPU PJRT plugin at interpreter
startup (sitecustomize); for multi-chip unit tests we override the
platform to CPU with 8 virtual devices BEFORE any backend initialization.
``jax.config.update('jax_platforms', ...)`` wins over the plugin's env
settings, unlike the env vars themselves.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("GRENDEL_TPU_TESTS"):
    # default: 8-device CPU mesh. GRENDEL_TPU_TESTS=1 keeps the real TPU
    # plugin so tests/test_tpu_hw.py can run on hardware:
    #   GRENDEL_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -q
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 CPU devices, got {devs}"
    return devs
