"""Profiling / tracing hooks (SURVEY.md section 5.1: the reference only has
MetricLogger wall-clock timing + cuda max-mem prints; here we expose the
jax profiler + device memory stats as first-class utilities)."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a TensorBoard-compatible profiler trace around a block.
    No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def start_profiler_server(port: int = 9999):
    """On-demand profiling via TensorBoard's capture button."""
    jax.profiler.start_server(port)


def device_memory_stats() -> dict:
    """Per-device HBM usage (the analogue of the reference's
    torch.cuda.max_memory_allocated log line, utils/misc.py:241)."""
    out = {}
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        out[str(d)] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    return out


def annotate(name: str):
    """Named trace span for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
