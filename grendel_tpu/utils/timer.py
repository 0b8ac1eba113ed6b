"""Keyed timers + end-to-end timer (tracing/profiling subsystem).

Parity target: /root/reference/utils/timer.py — ``Timer`` (keyed start/stop
pairs around hot stages, logged every log_interval iterations, L6-89) and
``End2endTimer`` (accumulates training time excluding eval/save, L92-116).
Where the reference calls ``torch.cuda.synchronize`` before reading the
clock, the TPU version calls ``jax.block_until_ready`` on a caller-supplied
array (or ``jax.effects_barrier``), since dispatch is async on TPU exactly
as on CUDA.

For kernel-level traces the TPU-native tool is ``jax.profiler`` —
``start_trace/stop_trace`` wrappers are provided here; view with
TensorBoard or xprof (reference counterpart: --zhx_time CUDA self-timing
and --nsys_profile NVTX ranges, SURVEY.md §5).
"""

from __future__ import annotations

import time
from typing import Dict, Optional


class Timer:
    """Keyed wall-clock timer with per-iteration reporting."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._start: Dict[str, float] = {}
        self._elapsed: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    def start(self, key: str) -> None:
        if self.enabled:
            self._start[key] = time.perf_counter()

    def stop(self, key: str, sync_on=None) -> None:
        """Stop a timer; pass a jax array as ``sync_on`` to include device
        completion (the analogue of the reference's cuda.synchronize)."""
        if not self.enabled or key not in self._start:
            return
        if sync_on is not None:
            import jax

            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._start.pop(key)
        self._elapsed[key] = self._elapsed.get(key, 0.0) + dt
        self._counts[key] = self._counts.get(key, 0) + 1

    def report(self, reset: bool = True) -> str:
        parts = []
        for key in sorted(self._elapsed):
            n = max(self._counts[key], 1)
            parts.append(
                f"{key}: {self._elapsed[key] * 1000:.2f} ms "
                f"(x{n}, avg {self._elapsed[key] / n * 1000:.2f} ms)")
        if reset:
            self._elapsed.clear()
            self._counts.clear()
        return "; ".join(parts)

    def elapsed(self, key: str) -> float:
        return self._elapsed.get(key, 0.0)


class End2endTimer:
    """Accumulates total training time, pausing around eval/save
    (ref: utils/timer.py:92-116)."""

    def __init__(self):
        self._total = 0.0
        self._since: Optional[float] = None

    def start(self) -> None:
        if self._since is None:
            self._since = time.perf_counter()

    def pause(self) -> None:
        if self._since is not None:
            self._total += time.perf_counter() - self._since
            self._since = None

    def total_seconds(self) -> float:
        extra = (time.perf_counter() - self._since) if self._since else 0.0
        return self._total + extra


def start_trace(logdir: str) -> None:
    """Begin a jax.profiler trace (xprof/TensorBoard viewable)."""
    import jax

    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    import jax

    jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Live/peak HBM bytes of this process's first device (ref memory
    monitors: utils/general_utils.py:283-345). Empty dict if unsupported.
    Must use a LOCAL device: under multi-host, jax.devices()[0] can be a
    non-addressable peer and MemoryStats raises on those."""
    import jax

    dev = jax.local_devices()[0]
    try:
        stats = getattr(dev, "memory_stats", lambda: None)()
    except Exception:
        return {}
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
