"""HBM budget model: honest device-memory numbers where the runtime hides
them.

The reference gates densification on live GPU memory
(/root/reference/utils/general_utils.py:283-345,
``--densify_memory_limit_percentage``). On TPU under some PJRT transports
(e.g. the axon tunnel) ``device.memory_stats()`` returns nothing, so the
round-1 build fell back to a hand-measured entry-capacity ceiling. This
module replaces that with XLA's own numbers: after a jitted step has
executed once, ``jit_fn.lower(*args).compile()`` hits the executable cache
(measured ~10ms) and ``memory_analysis()`` reports the exact temp/arg/out
buffer bytes the compiled program reserves — measured faithful at garden
scale (temp 2.5GB at bsz=1 + ~2.5GB per extra camera + ~65B per isect
entry on v5e).
"""

from __future__ import annotations

import os
from typing import Optional

# device_kind -> HBM bytes (per chip). Conservative public numbers.
_HBM_BY_KIND = {
    "TPU v2": 8 << 30,
    "TPU v3": 16 << 30,
    "TPU v4": 32 << 30,
    "TPU v5 lite": 16 << 30,
    "TPU v5e": 16 << 30,
    "TPU v5p": 95 << 30,
    "TPU v6 lite": 32 << 30,
    "TPU v6e": 32 << 30,
}

# marginal HBM bytes per intersection entry (payload + grad payload + sort
# and id buffers after XLA buffer reuse; measured 60MB per 917k entries)
BYTES_PER_ISECT_ENTRY = 72.0


def mantissa_round_cap(n: float, floor: int = 1 << 14,
                       align: int = 128) -> int:
    """Entry-capacity rounding shared by the trainer's tuner
    (Trainer._round_cap), bench.py and scripts/profile_step.py — one
    recipe so the benchmarks size buffers exactly like production: clamp
    to ``floor``, round up to a 1/8-power-of-two mantissa step (pow2
    doubling wasted up to 2x on capacity-proportional per-index ops),
    then align up to ``align`` (the rasterizer CHUNK, x bsz for the
    camera-blocked layout)."""
    import numpy as np

    n = max(int(n), floor)
    k = max(int(np.floor(np.log2(n))) - 3, 7)
    cap = -(-n // (1 << k)) << k
    return -(-cap // align) * align


def hbm_bytes_limit() -> Optional[int]:
    """Per-device HBM size: memory_stats when the runtime reports it, else
    a device-kind table, else None (no guard — e.g. CPU meshes)."""
    import jax

    env = os.environ.get("GRENDEL_HBM_GB")
    if env:
        return int(float(env) * (1 << 30))
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats and stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    kind = getattr(dev, "device_kind", "")
    for k, v in _HBM_BY_KIND.items():
        if kind.startswith(k):
            return v
    return None


def compiled_bytes(jit_fn, *args) -> Optional[int]:
    """Total reserved bytes (temp + args + outputs) of the compiled
    executable for ``jit_fn(*args)``. Call AFTER the first real execution:
    the lower+compile then resolves from the executable cache (~10ms).
    Returns None when the backend does not support memory analysis."""
    try:
        ma = jit_fn.lower(*args).compile().memory_analysis()
        if ma is None:
            return None
        total = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes)
        return int(total) if total > 0 else None
    except Exception:
        return None
