"""Profiling hooks: jax.profiler traces viewable in Perfetto/TensorBoard."""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nnaudio_tpu_trace"):
    """Context manager capturing a device trace of the enclosed computation.

    >>> with trace("/tmp/t"):
    ...     spec = stft(x).block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
