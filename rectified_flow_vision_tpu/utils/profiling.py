"""Profiling / tracing hooks (SURVEY §5: the reference has only manual
time.time() spans, reference: experiments/benchmark.py:43-69).

* ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution,
* ``annotate(name)``: TraceAnnotation for named host spans inside a trace,
* ``nan_check(enable)``: toggles jax_debug_nans — the SPMD-world analogue
  of a race detector pass for numerics,
* ``device_memory_stats()``: per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str = "logs/jax_trace") -> Iterator[None]:
    """Capture a device trace: view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span shown inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def nan_check(enable: bool = True) -> Iterator[None]:
    """Raise on NaN production inside jitted code while active."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """bytes_in_use / peak per device (empty dict where unsupported)."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:  # noqa: BLE001 - backend-dependent
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": int(s.get("bytes_in_use", 0)),
                "peak_bytes_in_use": int(s.get("peak_bytes_in_use", 0)),
            }
    return stats
