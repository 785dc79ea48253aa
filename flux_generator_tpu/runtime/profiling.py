"""Tracing / profiling / memory stats.

The reference reports wall-clock spans + mx.metal.get_peak_memory per phase
(flux_app.py:657-704, txt2image.py:101-127). TPU equivalents: jax.profiler
traces (view in XProf/TensorBoard) and per-device memory_stats; the same
user-facing phase stats live in PhaseTimer.
"""

from __future__ import annotations

import contextlib
import time

import jax


def device_memory_stats(device=None) -> dict:
    """Peak/in-use HBM bytes for a device (xla memory_stats when exposed).
    The axon tunnel plugin exposes no memory_stats; fall back to summing the
    live on-device arrays — resident bytes, a lower bound on peak."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)() or {}
    if not stats:
        try:
            in_use = sum(
                a.nbytes for a in jax.live_arrays()
                if device in getattr(a, "devices", lambda: set())()
            )
        except Exception:
            in_use = 0
        return {"bytes_in_use": in_use, "peak_bytes_in_use": in_use,
                "bytes_limit": 0, "is_resident_lower_bound": True}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def peak_memory_gb(device=None) -> float:
    return device_memory_stats(device)["peak_bytes_in_use"] / 1e9


class PhaseTimer:
    """Named phase spans, like the reference's text-encode / generation /
    decode stats panel."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        lines = [f"{k}: {v:.2f}s" for k, v in self.phases.items()]
        mem = device_memory_stats()
        if mem["peak_bytes_in_use"]:
            lines.append(f"peak HBM: {mem['peak_bytes_in_use'] / 1e9:.2f} GB")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fgt-trace"):
    """jax.profiler trace context; view with XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
