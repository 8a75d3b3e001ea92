"""Bucketed lengths + padding masks for variable-length audio under jit.

SURVEY.md §7 hard parts: "Dynamic audio lengths → recompilation; mitigate
with bucketed lengths + padding masks." Every distinct input length triggers
a fresh XLA compile; production pipelines with ragged utterances round
lengths up to a small set of buckets (bounding compile count) and mask the
frames that touch padding.

    x_pad, valid = pad_to_bucket(batch_of_utterances, hop=512)
    spec = stft(x_pad)                               # one compile per bucket
    mask = frame_mask(spec.shape[-1], valid, n_fft=2048, hop=512)
    pooled = (spec * mask[:, None, :]).sum(-1) / mask.sum(-1, keepdims=True)
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def default_buckets(max_seconds: float = 60.0, sr: float = 22050,
                    granularity: float = 1.5) -> list[int]:
    """Geometric bucket boundaries (samples): each ~``granularity`` x the
    previous, so at most ``log_g(max/min)`` compiles ever happen."""
    out, n = [], int(sr)  # 1 second minimum bucket
    while n < max_seconds * sr:
        out.append(n)
        n = int(n * granularity)
    out.append(int(max_seconds * sr))
    return out


def bucket_length(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length (the largest bucket if none fits)."""
    for b in buckets:
        if b >= length:
            return b
    return buckets[-1]


def pad_to_bucket(signals: Sequence[np.ndarray],
                  buckets: Sequence[int] | None = None,
                  sr: float = 22050):
    """Ragged utterances -> (batch array padded to one bucket, valid lengths).

    All utterances share the bucket of the longest one, so a ragged batch
    costs one compile. Zero padding on the right (mask the affected frames;
    reflect-centered transforms additionally perturb the first/last
    ``n_fft//2 // hop`` frames of *any* padded signal).
    """
    if buckets is None:
        buckets = default_buckets(sr=sr)
    lengths = np.array([np.shape(s)[-1] for s in signals])
    target = bucket_length(int(lengths.max()), buckets)
    if lengths.max() > target:
        import warnings

        warnings.warn(
            f"signal(s) of length up to {int(lengths.max())} exceed the "
            f"largest bucket ({target}) and will be truncated",
            stacklevel=2,
        )
        lengths = np.minimum(lengths, target)
    batch = np.zeros((len(signals), target), dtype=np.float32)
    for i, s in enumerate(signals):
        # lengths are already clamped to the bucket, so one slice suffices
        batch[i, : lengths[i]] = np.asarray(s, dtype=np.float32)[..., : lengths[i]]
    return jnp.asarray(batch), jnp.asarray(lengths)


def valid_frame_count(valid_len, n_fft: int, hop: int, center: bool = True):
    """Frames whose analysis window touches only valid samples.

    center=True: frame t spans samples [t*hop - n_fft//2, t*hop + n_fft//2);
    fully-valid frames satisfy t*hop + n_fft//2 <= valid_len. center=False:
    t*hop + n_fft <= valid_len."""
    if center:
        return jnp.maximum((valid_len - n_fft // 2) // hop + 1, 0)
    return jnp.maximum((valid_len - n_fft) // hop + 1, 0)


def frame_mask(n_frames: int, valid_len, n_fft: int, hop: int,
               center: bool = True) -> jax.Array:
    """(B, n_frames) float mask: 1 for frames fully inside valid samples."""
    counts = valid_frame_count(jnp.asarray(valid_len), n_fft, hop, center)
    t = jnp.arange(n_frames)[None, :]
    return (t < counts[:, None]).astype(jnp.float32)
