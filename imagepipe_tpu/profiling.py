"""Profiling helpers.

The reference instruments per-stage wall time with the do_timing! macro
(/root/reference/src/pipeline.rs:68-80; SURVEY.md section 5 notes those logs
are wrong under async device dispatch). Here:

  * per-stage wall logs come from pipeline._timing (same log line format);
  * device-accurate traces come from jax.profiler via `trace(...)` below --
    open the dump in TensorBoard / Perfetto;
  * `timed_sync(fn)` measures one call with a real device fence (the remote
    TPU platform's block_until_ready is not a reliable fence; a scalar
    device->host fetch is).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["trace", "timed_sync", "device_fence"]


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope: with profiling.trace('/tmp/trace'): ..."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_fence(out) -> None:
    """Force completion of `out` (device array or pytree leaf)."""
    import jax.numpy as jnp

    arr = out.data if hasattr(out, "data") and not isinstance(out.data, np.ndarray) else out
    if isinstance(arr, np.ndarray):
        return
    np.asarray(jnp.sum(arr.ravel()[:: max(1, arr.size // 64)].astype(jnp.float32)))


def timed_sync(fn, *args, iters: int = 1, **kwargs):
    """(result, seconds_per_iter) with a real device fence."""
    out = fn(*args, **kwargs)
    device_fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    device_fence(out)
    return out, (time.perf_counter() - t0) / iters
