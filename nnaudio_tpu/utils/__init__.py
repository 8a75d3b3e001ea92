"""Auxiliary subsystems: checkpointing and profiling (SURVEY.md §5).

The reference gets checkpointing for free from ``nn.Module.state_dict``; here
every transform is a pytree of arrays, saved with orbax (or a plain ``.npz``
fallback). Profiling wraps ``jax.profiler`` traces — the reference only has
``verbose`` wall-clock prints at construction time.
"""
from .buckets import (
    bucket_length,
    default_buckets,
    frame_mask,
    pad_to_bucket,
    valid_frame_count,
)
from .checkpoint import (
    load_params,
    load_sharded,
    restore_transform,
    save_params,
    save_sharded,
)
from .profiling import trace

__all__ = [
    "save_params",
    "load_params",
    "save_sharded",
    "load_sharded",
    "restore_transform",
    "trace",
    "pad_to_bucket",
    "bucket_length",
    "default_buckets",
    "frame_mask",
    "valid_frame_count",
]
